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
from py_psnode_tpu.ops.fused_dae import normalize_solver, precompute_streams
from py_psnode_tpu.ops.fused_dae_vjp import fused_dae_rollout_diff
from py_psnode_tpu.solvers import event_match, jumped_stream


def fused_dae_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Forward the DAE no-encode model via the fused kernel.

    Args:
      params: full model params (``{"params": {...}}``).
      batch: dict with batch-major ``t/x/z/v/i/event_t/z_jump/v_jump``.
      dims: ``(x_dim, z_dim, v_dim, i_dim)``.

    Returns ``(x_pred, i_pred)`` batch-major — same contract as
    ``DAEModel.__call__`` (ref neural_01_DAE_01_no_encode.py:95-115).
    """
    solver = normalize_solver(solver)
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
        streams, weights, x0, i0, dt, ev, solver, interpret, precision
    )
    return tm(x_sol), tm(i_sol)


def dae_encode_setup(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    tf_x: bool = False,
    with_streams: bool = True,
):
    """Shared preamble for every fused/parallel DAE direct-encode forward
    (rollout, TF-x, TF-i, full-TF): codecs + Init in XLA, events jumped in
    latent space, the initial algebraic eval, and (optionally) the layer-1
    stream precompute for the kernel paths. Under ``tf_x`` the initial
    algebraic output reads the ENCODED TRUE initial state (the
    ``integrate_dae`` i0 rule, ref my_solvers.py:95 with input_true_x).

    Returns a dict of named intermediates (see keys below).
    """
    from py_psnode_tpu.models.funcs import Codec

    xd, zd, vd, idim = dims
    h = hidden_dim
    p = params["params"]
    tm = lambda a: jnp.swapaxes(a, 0, 1)

    codec = lambda name, out: (
        lambda a: Codec((h, out)).apply({"params": p[name]}, a)
    )
    x_enc = codec("x_encoder", h)
    x_dec = codec("x_decoder", xd)
    v_enc = codec("v_encoder", h)
    i_enc = codec("i_encoder", h)
    i_dec = codec("i_decoder", idim)
    z_enc = codec("z_encoder", h) if zd != 0 else (lambda a: a)

    tT = tm(batch["t"]).astype(jnp.float32)
    zT_raw, vT_raw, iT_raw = tm(batch["z"]), tm(batch["v"]), tm(batch["i"])
    x0 = InitFunc((h, h, xd)).apply(
        {"params": p["init_func"]}, zT_raw[0], vT_raw[0], iT_raw[0]
    )
    xh0 = x_enc(x0)
    xh = x_enc(batch["x"])
    zh = z_enc(batch["z"])
    vh = v_enc(batch["v"])
    ih = i_enc(batch["i"])
    zh_jump = (
        z_enc(batch["z_jump"]) if batch.get("z_jump") is not None else None
    )
    vh_jump = (
        v_enc(batch["v_jump"]) if batch.get("v_jump") is not None else None
    )

    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    zh_used = tm(jumped_stream(zh, zh_jump, is_event, e_idx))[:-1]
    vh_used = tm(jumped_stream(vh, vh_jump, is_event, e_idx))[:-1]
    ev = tm(is_event[:, :, None])[:-1, :, 0]

    xhT, zhT, vhT, ihT = tm(xh), tm(zh), tm(vh), tm(ih)
    all_initial = jnp.concatenate([xh0, zhT[0], vhT[0], ihT[0]], axis=-1)
    zl = zh.shape[-1]  # latent z width (0 when z_dim == 0)
    ae = AEFunc((h, h))
    i0 = ae.apply(
        {"params": p["ae_func"]}, all_initial,
        xhT[0] if tf_x else xh0, zhT[0], vhT[0],
    )
    if with_streams:
        streams, weights = precompute_streams(
            p, all_initial, zhT, vhT, zh_used, vh_used, (h, zl, h, h)
        )
    else:
        streams = weights = None
    return dict(
        p=p, ae=ae, tT=tT, x0=x0, xh0=xh0, xh=xh, ih=ih,
        xhT=xhT, zhT=zhT, vhT=vhT, ihT=ihT,
        zh_used=zh_used, vh_used=vh_used, ev=ev,
        all_initial=all_initial, i0=i0,
        streams=streams, weights=weights, dt=tT[1:] - tT[:-1],
        x_dec=x_dec, i_dec=i_dec,
    )


def dae_encode_outputs(s: Dict, xh_sol, ih_sol):
    """Decode latent solutions into the ``DAEEncodeModel.__call__`` 4-tuple
    ``(x_pred, i_pred, x_re, i_re)``, forcing the decoded initial row to the
    raw Init output (ref neural_01_DAE_02_direct_encode.py:150)."""
    tm = lambda a: jnp.swapaxes(a, 0, 1)
    x_pred = s["x_dec"](xh_sol)
    x_pred = x_pred.at[0].set(s["x0"])
    i_pred = s["i_dec"](ih_sol)
    x_re = s["x_dec"](s["xh"])
    i_re = s["i_dec"](s["ih"])
    return tm(x_pred), tm(i_pred), x_re, i_re


def fused_dae_encode_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Fused forward for the DAE direct-encode variant
    (ref neural_01_DAE_02_direct_encode.py:103-153): the five codecs and the
    Init net run in XLA, the latent 2-layer DE/AE nets roll out through the
    fused kernel pair, events jump in latent space, and the decoded initial
    row is overwritten with the raw Init output (ref :150).

    Returns ``(x_pred, i_pred, x_re, i_re)`` batch-major — the
    ``DAEEncodeModel.__call__`` contract.
    """
    solver = normalize_solver(solver)
    s = dae_encode_setup(params, batch, dims, hidden_dim)
    xh_sol, ih_sol = fused_dae_rollout_diff(
        s["streams"], s["weights"], s["xh0"], s["i0"], s["dt"], s["ev"],
        solver, interpret, precision,
    )
    return dae_encode_outputs(s, xh_sol, ih_sol)
