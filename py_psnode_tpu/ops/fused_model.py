"""Model-level entry for the fused Pallas DAE path.

Drop-in replacement for ``DAEModel.apply`` in rollout mode (no teacher
forcing): the Init/AE initial evaluations and the stream precompute run in
XLA (differentiated by JAX), the time loop runs through the custom-VJP
Pallas kernel pair. Produces identical outputs/grads to the XLA scan path
(golden-tested) at ~5× forward speed.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from py_psnode_tpu.models.funcs import AEFunc, InitFunc
from py_psnode_tpu.ops.fused_dae import precompute_streams
from py_psnode_tpu.ops.fused_dae_vjp import fused_dae_rollout_diff
from py_psnode_tpu.solvers import event_match, jumped_stream


def fused_dae_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
):
    """Forward the DAE no-encode model via the fused kernel.

    Args:
      params: full model params (``{"params": {...}}``).
      batch: dict with batch-major ``t/x/z/v/i/event_t/z_jump/v_jump``.
      dims: ``(x_dim, z_dim, v_dim, i_dim)``.

    Returns ``(x_pred, i_pred)`` batch-major — same contract as
    ``DAEModel.__call__`` (ref neural_01_DAE_01_no_encode.py:95-115).
    """
    xd, zd, vd, idim = dims
    h = hidden_dim
    p = params["params"]
    tm = lambda a: jnp.swapaxes(a, 0, 1)
    tT = tm(batch["t"]).astype(jnp.float32)
    zT, vT, iT = tm(batch["z"]), tm(batch["v"]), tm(batch["i"])
    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = tm(
        jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    )[:-1]
    v_used = tm(
        jumped_stream(batch["v"], batch.get("v_jump"), is_event, e_idx)
    )[:-1]
    ev = tm(is_event[:, :, None])[:-1, :, 0]

    x0 = InitFunc((h, h, xd)).apply({"params": p["init_func"]}, zT[0], vT[0], iT[0])
    all_initial = jnp.concatenate([x0, zT[0], vT[0], iT[0]], axis=-1)
    i0 = AEFunc((h, h, h, idim)).apply(
        {"params": p["ae_func"]}, all_initial, x0, zT[0], vT[0]
    )
    streams, weights = precompute_streams(
        p, all_initial, zT, vT, z_used, v_used, (xd, zd, vd, idim)
    )
    dt = tT[1:] - tT[:-1]
    x_sol, i_sol = fused_dae_rollout_diff(
        streams, weights, x0, i0, dt, ev, solver, interpret
    )
    return tm(x_sol), tm(i_sol)
