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
    # exact name parity with the reference's "model_checkpoint.{epoch}".
    # tmp + rename: a crash mid-write must not leave a truncated checkpoint
    # for auto-resume to trip over
    path = pathlib.Path(path)
    tmp = path.with_name(path.name + ".tmp")
    # device_get overlaps the per-leaf device->host copies (async copy of
    # every leaf is issued before the first blocking read); letting np.savez
    # pull leaves one by one instead pays the device tunnel's ~40 ms RTT per
    # tensor — measured 0.57 s/epoch vs ~0.08 s for the h=128 DAE model
    params = jax.device_get(params)
    with open(tmp, "wb") as f:
        np.savez(f, **flatten_params(params))
    tmp.replace(path)


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


def flatten_channelwise(params, prefix="") -> Dict[str, np.ndarray]:
    """Flatten a channel-wise subtree for the flat-bin runtime.

    Binfmt/runtime decision: the dependency-free C++ runtime
    (native/psnode_infer.cpp) evaluates 2-D ``Dense→ELU`` stacks discovered
    by the ``<prefix>/dense_k/{kernel,bias}`` naming. ``PerChannelMLP``
    holds STACKED per-channel weights (``w_k [C, in, out]``, ``b_k [C,
    out]``) — those are sliced here into C independent nets named
    ``<sub>/c<channel>/dense_<k>/...`` so the existing runtime loads the
    channel-wise family without any C++ changes (one net per channel, plus
    the plain-MLP "vertical" nets passing through unchanged). The ``.npz``
    snapshot keeps the stacked layout for Python consumers; only the
    ``.bin`` uses the sliced naming.
    """
    out = {}
    if not isinstance(params, dict):
        out[prefix[:-1]] = np.asarray(params)
        return out
    stacked = sorted(
        (k for k in params if k.startswith("w_")), key=lambda k: int(k[2:])
    )
    if stacked and all(f"b_{k[2:]}" in params for k in stacked):
        extras = set(params) - {k for k in stacked} - {f"b_{k[2:]}" for k in stacked}
        if extras:
            raise ValueError(
                f"PerChannelMLP subtree {prefix!r} mixes stacked layers with "
                f"other entries {sorted(extras)}; cannot slice safely"
            )
        C = np.asarray(params[stacked[0]]).shape[0]
        for c in range(C):
            for li, wk in enumerate(stacked):
                out[f"{prefix}c{c}/dense_{li}/kernel"] = np.asarray(
                    params[wk][c]
                )
                out[f"{prefix}c{c}/dense_{li}/bias"] = np.asarray(
                    params[f"b_{wk[2:]}"][c]
                )
        return out
    for k, v in params.items():
        out.update(flatten_channelwise(v, f"{prefix}{k}/"))
    return out


def export_channelwise_submodule(
    path: pathlib.Path, name: str, sub_params,
    stablehlo_fn=None, example_args=(),
):
    """Write the channel-wise artifacts for one submodule: stacked ``.npz``,
    per-channel-sliced ``.bin`` (see :func:`flatten_channelwise`), and a
    best-effort StableHLO of the submodule forward when provided."""
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    np.savez(path / f"{name}.weights.npz", **flatten_params(sub_params))
    write_weights_bin(path / f"{name}.weights.bin", flatten_channelwise(sub_params))
    if stablehlo_fn is not None:
        hlo_path = path / f"{name}.stablehlo"
        if not hlo_path.exists():
            export_stablehlo(hlo_path, stablehlo_fn, (sub_params, *example_args))


def write_dim_txt(path: pathlib.Path, hidden_dim: int):
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    (pathlib.Path(path) / "dim.txt").write_text(str(hidden_dim))
