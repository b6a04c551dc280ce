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
