"""Checkpoint backends.

The default trainer checkpoints are single-file npz snapshots with exact
reference name parity (``model_checkpoint.{epoch}``, ref
neural_00_ODE_01_no_encode.py:390). This module adds:

  * :class:`OrbaxCheckpointer` — orbax-backed directory checkpoints with
    optional async save (the SURVEY.md §5 elastic-recovery plan), retention
    of the last N epochs, and optimizer-state capture for true resume (the
    reference restarts the optimizer on resume);
  * :func:`latest_checkpoint` — auto-resume discovery over either format.
"""

from __future__ import annotations

import pathlib
import re
from typing import Optional, Tuple


def list_checkpoints(model_dir):
    """All ``model_checkpoint.{epoch}`` entries (files or orbax dirs),
    NEWEST FIRST — auto-resume walks this list so a checkpoint truncated by
    the very crash being recovered from falls back to an older epoch."""
    model_dir = pathlib.Path(model_dir)
    if not model_dir.exists():
        return []
    found = []
    for p in model_dir.iterdir():
        m = re.fullmatch(r"model_checkpoint\.(\d+)", p.name)
        if m:
            found.append((int(m.group(1)), p))
    return sorted(found, reverse=True)


def latest_checkpoint(model_dir) -> Optional[Tuple[int, pathlib.Path]]:
    """Find the newest ``model_checkpoint.{epoch}`` (file or orbax dir)."""
    found = list_checkpoints(model_dir)
    return found[0] if found else None


def best_checkpoint(model_dir):
    """Pick the SAVED checkpoint with the lowest finite eval x-loss.

    Reads the run's ``train_and_eval.npz`` history (eval row ``r`` is the
    eval logged right after ``model_checkpoint.r`` was saved; row 0 is the
    pre-training eval, which has no checkpoint). Only epochs whose
    checkpoint still exists on disk compete, so orbax retention pruning or
    manual cleanup degrade gracefully to the best *available* epoch. This
    is the early-stop restore path for diverging runs (e.g. dae_channelwise
    at the reference envelope, ACCURACY.md): the best epoch's params are on
    disk even though the final ones are NaN.

    Returns ``(epoch, path, eval_x)`` or ``None`` when there is no history,
    no checkpoint, or no finite eval.
    """
    import numpy as np

    model_dir = pathlib.Path(model_dir)
    hist_f = model_dir / "train_and_eval.npz"
    saved = dict(
        (ep, p) for ep, p in list_checkpoints(model_dir)
    )
    if not hist_f.exists() or not saved:
        return None
    hist = np.load(hist_f, allow_pickle=True)
    best = None
    for row, e in enumerate(hist["eval"]):
        if row == 0 or row not in saved:  # row 0 = pre-training eval
            continue
        x = float(np.asarray(e[0], np.float64))
        if np.isfinite(x) and (best is None or x < best[2]):
            best = (row, saved[row], x)
    return best


def resolve_checkpoint(path) -> pathlib.Path:
    """Resolve a ``--model`` argument to a concrete checkpoint.

    A ``model_checkpoint.{epoch}`` file or orbax dir passes through
    unchanged (exact reference behavior, ref script1:406-450). A RUN
    directory (one holding ``train_and_eval.npz`` + checkpoints) resolves
    to its best-eval epoch via :func:`best_checkpoint` — one command
    restores the best params of any run without fishing the epoch out of
    the logs by hand.
    """
    path = pathlib.Path(path)
    if not path.is_dir() or re.fullmatch(r"model_checkpoint\.\d+", path.name):
        return path
    best = best_checkpoint(path)
    if best is None:
        raise FileNotFoundError(
            f"{path} is a directory but holds no (train_and_eval.npz + "
            "model_checkpoint.<epoch>) pair with a finite eval — point "
            "--model at a checkpoint file/orbax dir or a completed run dir"
        )
    epoch, ckpt, eval_x = best
    print(
        f"--model {path}: selected best-eval checkpoint epoch {epoch} "
        f"(eval x_loss {eval_x:.6g}) -> {ckpt}",
        flush=True,
    )
    return ckpt


def load_checkpoint_params(path):
    """Load model params from either checkpoint format: a single-file npz
    snapshot (reference name parity) or an orbax checkpoint directory
    (which also carries ``opt_state`` — ignored here)."""
    import jax
    import jax.numpy as jnp

    path = pathlib.Path(path)
    if not path.exists():
        raise FileNotFoundError(f"{path} does not exist!")
    if path.is_dir() and not re.fullmatch(r"model_checkpoint\.\d+", path.name):
        raise ValueError(
            f"{path} is a directory but not a model_checkpoint.<epoch> orbax "
            "checkpoint — point --model at a checkpoint file or orbax "
            "checkpoint dir, not the model output directory"
        )
    if path.is_dir():
        import orbax.checkpoint as ocp

        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        state = ckptr.restore(path.resolve())
        params = state.get("params", state) if isinstance(state, dict) else state
        return jax.tree_util.tree_map(jnp.asarray, params)
    from py_psnode_tpu.export import load_params_npz

    return load_params_npz(path)


class OrbaxCheckpointer:
    """Orbax PyTree checkpoints of ``{"params": ..., "opt_state": ...}``."""

    def __init__(self, model_dir, keep: int = 3, use_async: bool = False):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.model_dir = pathlib.Path(model_dir).resolve()
        self.keep = keep
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if use_async
            else ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        )

    def save(self, epoch: int, params, opt_state=None):
        path = self.model_dir / f"model_checkpoint.{epoch}"
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        self._ckptr.save(path, state, force=True)
        self._gc(epoch)
        return path

    def restore(self, path, template=None):
        return self._ckptr.restore(pathlib.Path(path).resolve(), item=template)

    def wait(self):
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def _gc(self, newest_epoch: int):
        if self.keep is None:
            return
        import jax

        if jax.process_index() != 0:  # one deleter under multi-controller
            return
        for p in self.model_dir.iterdir():
            m = re.fullmatch(r"model_checkpoint\.(\d+)", p.name)
            if m and p.is_dir() and int(m.group(1)) <= newest_epoch - self.keep:
                import shutil

                shutil.rmtree(p, ignore_errors=True)


if __name__ == "__main__":  # python -m py_psnode_tpu.train.checkpoints <run_dir>
    import sys

    print(resolve_checkpoint(sys.argv[1]))
