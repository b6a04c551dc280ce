"""Trained-submodule export for embedding into external simulators.

The reference hands trained submodules to the C++ PSOPS simulator as
TorchScript files (``neural_00_ODE_01_no_encode.py:93-101``,
``neural_01_DAE_02_direct_encode.py:155-201``, ``README.md:45``). The
TPU-native equivalents written here, per submodule:

  * ``<name>.stablehlo``      — serialized ``jax.export`` artifact with the
    parameters as *inputs* (shape-stable across training, so it is written
    once and the per-epoch weight snapshots stay cheap)
  * ``<name>.weights.npz``    — flat ``{path: array}`` parameter snapshot
  * ``<name>.weights.bin``    — dependency-free flat binary (see
    :mod:`py_psnode_tpu.export.binfmt`) for the C++ mini-runtime
  * ``dim.txt``               — hidden-size sidecar for the encode variants
    (ref neural_00_ODE_02_direct_encode.py:93-94)

``save_model`` / ``final_save`` mirror the reference method names; the final
save re-serializes everything (the reference additionally moves to CPU first,
which has no analogue here).
"""

from __future__ import annotations

import pathlib
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from py_psnode_tpu.export.binfmt import write_weights_bin


def flatten_params(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for path, arr in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def save_params_npz(path, params):
    # write through a file object so np.savez cannot append ".npz" — keeps
    # exact name parity with the reference's "model_checkpoint.{epoch}"
    with open(path, "wb") as f:
        np.savez(f, **flatten_params(params))


def load_params_npz(path):
    with np.load(path) as f:
        return unflatten_params({k: f[k] for k in f.files})


def export_stablehlo(path, fn: Callable, example_args: Tuple):
    """Serialize ``fn(*example_args)`` via jax.export; best-effort (some
    backends lack export support — the weight artifacts are always written)."""
    try:
        from jax import export as jax_export

        exp = jax_export.export(jax.jit(fn))(
            *jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
                example_args,
            )
        )
        pathlib.Path(path).write_bytes(exp.serialize())
        return True
    except Exception:
        return False


def export_submodule(
    path: pathlib.Path, name: str, module, sub_params, example_args,
    refresh_stablehlo: bool = False,
):
    """Write the three artifacts for one flax submodule.

    ``module`` is a standalone flax module whose ``apply({'params': p}, *a)``
    reproduces the trained submodule; ``sub_params`` its parameter subtree.
    The StableHLO artifact is shape-stable across training (params are
    function inputs), so per-epoch saves skip re-serializing it unless
    ``refresh_stablehlo`` or the file is missing; the weight snapshots are
    always rewritten.
    """
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    hlo_path = path / f"{name}.stablehlo"
    if refresh_stablehlo or not hlo_path.exists():
        fn = lambda p, *a: module.apply({"params": p}, *a)
        export_stablehlo(hlo_path, fn, (sub_params, *example_args))
    flat = flatten_params(sub_params)
    np.savez(path / f"{name}.weights.npz", **flat)
    write_weights_bin(path / f"{name}.weights.bin", flat)


def write_dim_txt(path: pathlib.Path, hidden_dim: int):
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    (pathlib.Path(path) / "dim.txt").write_text(str(hidden_dim))
