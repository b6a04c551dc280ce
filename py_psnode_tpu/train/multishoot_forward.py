"""Multi-shooting forward passes for the no-encode variants.

Training-mode counterpart of :mod:`py_psnode_tpu.solvers.multishoot`:
rebuilds the per-variant dynamics closures from the flax params (as the fused
path does) and returns ``(outputs, gaps)``; the trainer adds a continuity
penalty ``gap_weight * mean(gaps**2)`` — classical multiple shooting, the
TPU-native long-horizon strategy (time parallelism folded into batch).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from py_psnode_tpu.models.funcs import (
    AEFunc,
    ChannelWiseAEFunc,
    ChannelWiseDEFunc,
    Codec,
    DEFunc,
    InitFunc,
)
from py_psnode_tpu.solvers import event_match, jumped_stream
from py_psnode_tpu.solvers.multishoot import (
    _window_fold,
    _window_unfold,
    multishoot_dae,
    multishoot_ode,
    tile_batch,
)


def _tm(a):
    return jnp.swapaxes(a, 0, 1)


def _check_windows(T: int, K: int) -> int:
    if (T - 1) % K:
        raise ValueError(f"(T-1)={T - 1} not divisible by n_windows={K}")
    return (T - 1) // K


def multishoot_ode_apply(
    params: Dict,
    batch: Dict,
    x_dim: int,
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    remat=True,
    unroll: int = 1,
):
    """Returns ``(x_pred [B,T,xd], gaps [K-1,B,xd])``."""
    h = hidden_dim
    p = params["params"]
    de = DEFunc((h, h, h, x_dim))
    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = _tm(
        jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    )[:-1]
    tT, xT, zT = _tm(batch["t"]), _tm(batch["x"]), _tm(batch["z"])
    all_initial = jnp.concatenate([xT[0], zT[0]], axis=-1)
    tiled = tile_batch(all_initial, n_windows)
    de_fn = lambda tt, xx, zz: de.apply({"params": p["de_func"]}, tt, tiled, xx, zz)
    sol, gaps = multishoot_ode(
        solver, de_fn, tT, xT, z_used, n_windows, remat=remat, unroll=unroll
    )
    return _tm(sol), gaps


def multishoot_dae_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    remat=True,
    unroll: int = 1,
):
    """Returns ``((x_pred, i_pred) batch-major, gaps [K-1,B,xd])``.

    Window 0 starts from the learned ``Init_Func`` (the reference's t=0
    contract, ref neural_01_DAE_01_no_encode.py:98-99); windows 1.. start
    from the TRUE data states (per-window teacher forcing, the same data
    the reference's ``input_true_x`` lever reads). ``all_initial`` is the
    GLOBAL t=0 conditioning, tiled — every window continues the same IVP
    at the same operating point (see :func:`multishoot_dae` for why
    per-window ``Init_Func`` starts diverge).
    """
    xd, zd, vd, idim = dims
    h = hidden_dim
    p = params["params"]
    de = DEFunc((h, h, h, xd))
    ae = AEFunc((h, h, h, idim))
    init_f = InitFunc((h, h, xd))

    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = _tm(
        jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    )[:-1]
    v_used = _tm(
        jumped_stream(batch["v"], batch.get("v_jump"), is_event, e_idx)
    )[:-1]
    ev = _tm(is_event[:, :, None])[:-1, :, 0]
    tT = _tm(batch["t"])
    xT = _tm(batch["x"])
    zT, vT, iT = _tm(batch["z"]), _tm(batch["v"]), _tm(batch["i"])

    K = n_windows
    L = (tT.shape[0] - 1) // K
    B = tT.shape[1]
    x0_global = init_f.apply(
        {"params": p["init_func"]}, zT[0], vT[0], iT[0]
    )  # [B, xd]
    all_init = jnp.concatenate([x0_global, zT[0], vT[0], iT[0]], axis=-1)
    all_init_f = tile_batch(all_init, K)  # same w*B+b order as _window_fold
    starts = jnp.concatenate(
        [x0_global[None]] + [xT[w * L][None] for w in range(1, K)], 0
    )  # [K, B, xd]
    x0w = starts.reshape(K * B, xd)

    de_fn = lambda tt, xx, zz, vv, ii: de.apply(
        {"params": p["de_func"]}, tt, all_init_f, xx, zz, vv, ii
    )
    ae_fn = lambda xx, zz, vv: ae.apply(
        {"params": p["ae_func"]}, all_init_f, xx, zz, vv
    )
    x_sol, i_sol, gaps = multishoot_dae(
        solver, de_fn, ae_fn, x0w, tT, zT, vT, iT, z_used, v_used,
        n_windows, is_event=ev, remat=remat, unroll=unroll,
    )
    return (_tm(x_sol), _tm(i_sol)), gaps


def _ode_encode_prep(params, batch, hidden_dim):
    """Shared ODE direct-encode preamble: codec closures, latent streams,
    latent jumped inputs (events jump in latent space,
    ref neural_00_ODE_02_direct_encode.py:78)."""
    h = hidden_dim
    p = params["params"]
    x_dim = p["x_decoder"]["net"]["dense_1"]["kernel"].shape[-1]
    x_enc = lambda a: Codec((h, h)).apply({"params": p["x_encoder"]}, a)
    x_dec = lambda a: Codec((h, x_dim)).apply({"params": p["x_decoder"]}, a)
    z_enc = lambda a: Codec((h, h)).apply({"params": p["z_encoder"]}, a)
    xh = x_enc(batch["x"])
    zh = z_enc(batch["z"])
    zh_jump = z_enc(batch["z_jump"]) if batch.get("z_jump") is not None else None
    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    zh_used = _tm(jumped_stream(zh, zh_jump, is_event, e_idx))[:-1]
    tT = _tm(batch["t"]).astype(jnp.float32)
    return p, x_enc, x_dec, xh, zh, zh_used, tT


def multishoot_ode_encode_apply(
    params: Dict,
    batch: Dict,
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    remat=True,
    unroll: int = 1,
):
    """Multi-shooting for the ODE direct-encode variant: windows start from
    the ENCODED true states (teacher forcing in latent space — the encoder
    provides window initials for free), integrate the 2-layer latent
    dynamics, decode the stitched solution.

    Returns ``((x_pred, x_re), gaps [K-1, B, h])`` — the
    ``ODEEncodeModel.__call__`` output contract plus latent gaps.
    """
    h = hidden_dim
    p, x_enc, x_dec, xh, zh, zh_used, tT = _ode_encode_prep(params, batch, h)
    xhT, zhT = _tm(xh), _tm(zh)
    de = DEFunc((h, h))
    all_initial = jnp.concatenate([xhT[0], zhT[0]], axis=-1)
    tiled = tile_batch(all_initial, n_windows)
    de_fn = lambda tt, xx, zz: de.apply(
        {"params": p["de_func"]}, tt, tiled, xx, zz
    )
    xh_sol, gaps = multishoot_ode(
        solver, de_fn, tT, xhT, zh_used, n_windows, remat=remat, unroll=unroll
    )
    x_pred = x_dec(_tm(xh_sol))
    x_re = x_dec(xh)
    return (x_pred, x_re), gaps


def fused_multishoot_ode_encode_apply(
    params: Dict,
    batch: Dict,
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Fused-kernel counterpart of :func:`multishoot_ode_encode_apply`."""
    from py_psnode_tpu.ops.fused_dae import normalize_solver
    from py_psnode_tpu.ops.fused_ode import (
        fused_ode_rollout_diff,
        precompute_ode_streams,
    )

    solver = normalize_solver(solver)
    h = hidden_dim
    p, x_enc, x_dec, xh, zh, zh_used, tT = _ode_encode_prep(params, batch, h)
    xhT, zhT = _tm(xh), _tm(zh)
    T, B = tT.shape[0], tT.shape[1]
    K = n_windows
    L = _check_windows(T, K)

    tw = _window_fold(tT, K, L, 1)
    xhw = _window_fold(xhT, K, L, 1)
    zhw = _window_fold(zh_used, K, L, 0)
    all_initial = jnp.concatenate([xhT[0], zhT[0]], axis=-1)
    tiled = tile_batch(all_initial, K)
    s_de, weights = precompute_ode_streams(p, tiled, zhw, h)
    dt = tw[1:] - tw[:-1]
    sol_w = fused_ode_rollout_diff(
        s_de, weights, xhw[0], dt, solver, interpret, precision
    )
    xh_sol = _window_unfold(sol_w, K, L, B)
    ends = sol_w[-1].reshape(K, B, -1)[:-1]
    next_starts = xhw[0].reshape(K, B, -1)[1:]
    x_pred = x_dec(_tm(xh_sol))
    x_re = x_dec(xh)
    return (x_pred, x_re), ends - next_starts


def _dae_encode_prep(params, batch, dims, hidden_dim, n_windows):
    """Shared DAE direct-encode multishoot preamble: five codecs, latent
    streams with latent event jumps, folded latent streams. Window 0's
    initial is raw ``Init_Func`` then encode (the model initializes from
    RAW z/v/i then encodes, ref neural_01_DAE_02_direct_encode.py:126-127);
    windows 1.. start from the ENCODED TRUE data states, and the
    ``all_initial`` conditioning is the global t=0 value tiled — see
    :func:`py_psnode_tpu.solvers.multishoot.multishoot_dae` for why
    per-window ``Init_Func`` starts diverge.
    """
    xd, zd, vd, idim = dims
    h = hidden_dim
    p = params["params"]
    codec = lambda name, out: (
        lambda a: Codec((h, out)).apply({"params": p[name]}, a)
    )
    x_enc, x_dec = codec("x_encoder", h), codec("x_decoder", xd)
    v_enc, i_enc = codec("v_encoder", h), codec("i_encoder", h)
    i_dec = codec("i_decoder", idim)
    z_enc = codec("z_encoder", h) if zd != 0 else (lambda a: a)

    zh, vh, ih = z_enc(batch["z"]), v_enc(batch["v"]), i_enc(batch["i"])
    zh_jump = z_enc(batch["z_jump"]) if batch.get("z_jump") is not None else None
    vh_jump = v_enc(batch["v_jump"]) if batch.get("v_jump") is not None else None
    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    zh_used = _tm(jumped_stream(zh, zh_jump, is_event, e_idx))[:-1]
    vh_used = _tm(jumped_stream(vh, vh_jump, is_event, e_idx))[:-1]
    ev = _tm(is_event[:, :, None])[:-1, :, 0]

    tT = _tm(batch["t"]).astype(jnp.float32)
    zhT, vhT, ihT = _tm(zh), _tm(vh), _tm(ih)
    zT_raw, vT_raw, iT_raw = _tm(batch["z"]), _tm(batch["v"]), _tm(batch["i"])
    T, B = tT.shape[0], tT.shape[1]
    K = n_windows
    L = _check_windows(T, K)

    tw = _window_fold(tT, K, L, 1)
    zhw_full = _window_fold(zhT, K, L, 1)
    vhw_full = _window_fold(vhT, K, L, 1)
    ihw_full = _window_fold(ihT, K, L, 1)
    zhw = _window_fold(zh_used, K, L, 0)
    vhw = _window_fold(vh_used, K, L, 0)
    evw = _window_fold(ev[:, :, None], K, L, 0)[:, :, 0]

    # window 0: raw Init → encode; windows 1..: true data states → encode
    xT_raw = _tm(batch["x"])
    x0_global_raw = InitFunc((h, h, xd)).apply(
        {"params": p["init_func"]}, zT_raw[0], vT_raw[0], iT_raw[0]
    )  # [B, xd]
    starts_raw = jnp.concatenate(
        [x0_global_raw[None]] + [xT_raw[w * L][None] for w in range(1, K)], 0
    )  # [K, B, xd]
    x0_raw_w = starts_raw.reshape(K * B, xd)
    xh0_w = x_enc(x0_raw_w)
    all_init = jnp.concatenate(
        [x_enc(x0_global_raw), zhT[0], vhT[0], ihT[0]], axis=-1
    )  # global t=0 latent conditioning
    all_init_f = tile_batch(all_init, K)  # same w*B+b order as _window_fold
    zl = zhT.shape[-1]
    return (
        p, x_enc, x_dec, i_dec, i_enc, tT, T, B, K, L, tw,
        zhw_full, vhw_full, ihw_full, zhw, vhw, evw,
        x0_raw_w, xh0_w, all_init_f, zl,
    )


def _dae_encode_finish(x_enc, x_dec, i_dec, i_enc, batch, xd,
                       xh_sol_w, ih_sol_w, x0_raw_w, xh0_w, K, L, B):
    """Unfold, decode, force the global initial row (ref :150), recon."""
    xh_sol = _window_unfold(xh_sol_w, K, L, B)
    ih_sol = _window_unfold(ih_sol_w, K, L, B)
    x_pred = x_dec(_tm(xh_sol))
    x0_global = x0_raw_w.reshape(K, B, xd)[0]
    x_pred = x_pred.at[:, 0].set(x0_global)  # ref :150 — Init row forced
    i_pred = i_dec(_tm(ih_sol))
    x_re = x_dec(x_enc(batch["x"]))
    i_re = i_dec(i_enc(batch["i"]))
    ends = xh_sol_w[-1].reshape(K, B, -1)[:-1]
    next_starts = xh0_w.reshape(K, B, -1)[1:]
    return (x_pred, i_pred, x_re, i_re), ends - next_starts


def multishoot_dae_encode_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    remat=True,
    unroll: int = 1,
):
    """Multi-shooting for the DAE direct-encode variant: latent windows
    (window 0 raw-``Init``-then-encode, windows 1.. encoded true data),
    latent event jumps, lagged-``i`` latent integration, decode + recon
    outputs.

    Returns ``((x_pred, i_pred, x_re, i_re), gaps [K-1, B, h])``.
    """
    from py_psnode_tpu.solvers.integrate import integrate_dae

    h = hidden_dim
    (p, x_enc, x_dec, i_dec, i_enc, tT, T, B, K, L, tw,
     zhw_full, vhw_full, ihw_full, zhw, vhw, evw,
     x0_raw_w, xh0_w, all_init_f, zl) = _dae_encode_prep(
        params, batch, dims, hidden_dim, n_windows
    )
    de = DEFunc((h, h))
    ae = AEFunc((h, h))
    de_fn = lambda tt, xx, zz, vv, ii: de.apply(
        {"params": p["de_func"]}, tt, all_init_f, xx, zz, vv, ii
    )
    ae_fn = lambda xx, zz, vv: ae.apply(
        {"params": p["ae_func"]}, all_init_f, xx, zz, vv
    )
    xh_sol_w, ih_sol_w = integrate_dae(
        solver, de_fn, ae_fn, xh0_w, tw, zhw_full, vhw_full, zhw, vhw,
        is_event=evw, remat=remat, unroll=unroll,
    )
    return _dae_encode_finish(
        x_enc, x_dec, i_dec, i_enc, batch, dims[0],
        xh_sol_w, ih_sol_w, x0_raw_w, xh0_w, K, L, B,
    )


def fused_multishoot_dae_encode_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Fused-kernel counterpart of :func:`multishoot_dae_encode_apply`."""
    from py_psnode_tpu.ops.fused_dae import normalize_solver, precompute_streams
    from py_psnode_tpu.ops.fused_dae_vjp import fused_dae_rollout_diff

    solver = normalize_solver(solver)
    h = hidden_dim
    (p, x_enc, x_dec, i_dec, i_enc, tT, T, B, K, L, tw,
     zhw_full, vhw_full, ihw_full, zhw, vhw, evw,
     x0_raw_w, xh0_w, all_init_f, zl) = _dae_encode_prep(
        params, batch, dims, hidden_dim, n_windows
    )
    i0w = AEFunc((h, h)).apply(
        {"params": p["ae_func"]}, all_init_f, xh0_w, zhw_full[0], vhw_full[0]
    )
    streams, weights = precompute_streams(
        p, all_init_f, zhw_full, vhw_full, zhw, vhw, (h, zl, h, h)
    )
    dt = tw[1:] - tw[:-1]
    xh_sol_w, ih_sol_w = fused_dae_rollout_diff(
        streams, weights, xh0_w, i0w, dt, evw, solver, interpret, precision
    )
    return _dae_encode_finish(
        x_enc, x_dec, i_dec, i_enc, batch, dims[0],
        xh_sol_w, ih_sol_w, x0_raw_w, xh0_w, K, L, B,
    )


def fused_multishoot_ode_apply(
    params: Dict,
    batch: Dict,
    x_dim: int,
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Fused-kernel multi-shooting ODE forward: fold the K windows into the
    batch axis (K×B — exactly where the batch-blocked Pallas kernel shines),
    precompute the layer-1 streams once over the folded batch, and roll all
    windows out in ONE kernel launch of T/K sequential steps.

    Same contract as :func:`multishoot_ode_apply`:
    ``(x_pred [B,T,xd], gaps [K-1,B,xd])``.
    """
    from py_psnode_tpu.ops.fused_ode import (
        fused_ode_rollout_diff,
        precompute_ode_streams,
    )
    from py_psnode_tpu.ops.fused_dae import normalize_solver

    solver = normalize_solver(solver)
    p = params["params"]
    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = _tm(
        jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    )[:-1]
    tT = _tm(batch["t"]).astype(jnp.float32)
    xT, zT = _tm(batch["x"]), _tm(batch["z"])
    T, B = tT.shape[0], tT.shape[1]
    K = n_windows
    L = _check_windows(T, K)

    tw = _window_fold(tT, K, L, 1)
    xw = _window_fold(xT, K, L, 1)
    zw = _window_fold(z_used, K, L, 0)
    all_initial = jnp.concatenate([xT[0], zT[0]], axis=-1)
    tiled = tile_batch(all_initial, K)  # same w*B+b order as _window_fold

    s_de, weights = precompute_ode_streams(p, tiled, zw, x_dim)
    dt = tw[1:] - tw[:-1]
    sol_w = fused_ode_rollout_diff(
        s_de, weights, xw[0], dt, solver, interpret, precision
    )
    solution = _window_unfold(sol_w, K, L, B)
    ends = sol_w[-1].reshape(K, B, -1)[:-1]
    next_starts = xw[0].reshape(K, B, -1)[1:]
    return _tm(solution), ends - next_starts


def fused_multishoot_dae_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Fused-kernel multi-shooting DAE forward — the folded-batch counterpart
    of :func:`multishoot_dae_apply`: window 0 starts from the learned
    ``Init_Func`` (ref neural_01_DAE_01_no_encode.py:98), windows 1.. from
    the TRUE data states, ``all_initial`` is the global t=0 conditioning
    tiled, and the K×B folded rollout runs through the custom-VJP Pallas
    DAE kernel (see :func:`py_psnode_tpu.solvers.multishoot.multishoot_dae`
    for why per-window ``Init_Func`` starts diverge).

    Returns ``((x_pred, i_pred) batch-major, gaps [K-1,B,xd])``.
    """
    from py_psnode_tpu.ops.fused_dae import normalize_solver, precompute_streams
    from py_psnode_tpu.ops.fused_dae_vjp import fused_dae_rollout_diff

    solver = normalize_solver(solver)
    xd, zd, vd, idim = dims
    h = hidden_dim
    p = params["params"]

    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = _tm(
        jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    )[:-1]
    v_used = _tm(
        jumped_stream(batch["v"], batch.get("v_jump"), is_event, e_idx)
    )[:-1]
    ev = _tm(is_event[:, :, None])[:-1, :, 0]
    tT = _tm(batch["t"]).astype(jnp.float32)
    xT = _tm(batch["x"])
    zT, vT, iT = _tm(batch["z"]), _tm(batch["v"]), _tm(batch["i"])
    T, B = tT.shape[0], tT.shape[1]
    K = n_windows
    L = _check_windows(T, K)

    tw = _window_fold(tT, K, L, 1)
    zw_full = _window_fold(zT, K, L, 1)
    vw_full = _window_fold(vT, K, L, 1)
    iw_full = _window_fold(iT, K, L, 1)
    zw = _window_fold(z_used, K, L, 0)
    vw = _window_fold(v_used, K, L, 0)
    evw = _window_fold(ev[:, :, None], K, L, 0)[:, :, 0]

    init_f = InitFunc((h, h, xd))
    x0_global = init_f.apply({"params": p["init_func"]}, zT[0], vT[0], iT[0])
    all_init = jnp.concatenate([x0_global, zT[0], vT[0], iT[0]], -1)
    all_init_f = tile_batch(all_init, K)  # same w*B+b order as _window_fold
    starts = jnp.concatenate(
        [x0_global[None]] + [xT[w * L][None] for w in range(1, K)], 0
    )  # [K, B, xd]
    x0w = starts.reshape(K * B, xd)
    i0w = AEFunc((h, h, h, idim)).apply(
        {"params": p["ae_func"]}, all_init_f, x0w, zw_full[0], vw_full[0]
    )
    streams, weights = precompute_streams(
        p, all_init_f, zw_full, vw_full, zw, vw, dims
    )
    dt = tw[1:] - tw[:-1]
    x_sol_w, i_sol_w = fused_dae_rollout_diff(
        streams, weights, x0w, i0w, dt, evw, solver, interpret, precision
    )
    x_solution = _window_unfold(x_sol_w, K, L, B)
    i_solution = _window_unfold(i_sol_w, K, L, B)
    ends = x_sol_w[-1].reshape(K, B, -1)[:-1]
    next_starts = x0w.reshape(K, B, -1)[1:]
    return (_tm(x_solution), _tm(i_solution)), ends - next_starts


# --------------------------------------------------------------------------
# Channel-wise family (per-channel latent [B, xd, h], repaired
# neural_base.py:68-133/199-255 design). Multi-shooting windows start from
# the per-channel-ENCODED true states — latent teacher forcing, same pattern
# as the direct-encode variants — and the latent state folds into the batch
# axis flattened to [B, xd*h] so the generic window machinery applies.
# Routed through the XLA path for both TrainConfig.fused settings: the fused
# channel-wise kernel ties the XLA scan on-chip (ACCURACY.md, cw probes), so
# there is no fused multishoot counterpart to prefer.
# --------------------------------------------------------------------------


def _cw_prep(params, batch, x_dim, z_dim, hidden_dim, channel_impl):
    """Shared channel-wise preamble: method closures over the de_func
    params, latent true-state stream (window starts), global t=0 feature
    conditioning, scan-invariant z-features of the jumped input stream."""
    de = ChannelWiseDEFunc(
        x_dim=x_dim, z_dim=z_dim, hidden_dim=hidden_dim, impl=channel_impl
    )
    pde = {"params": params["params"]["de_func"]}

    def call(method, *a):
        return de.apply(pde, *a, method=method)

    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    tT = _tm(batch["t"])
    xh_true = call("encode_x", _tm(batch["x"]))  # [T, B, xd, h]
    # global t=0 conditioning from RAW z (the model reads _tm(z)[0])
    f_init = call("features_of", xh_true[0], _tm(batch["z"])[0])
    fz = call("z_features", _tm(z_used)[:-1])  # [T-1, B, zd, h]
    return call, tT, xh_true, f_init, fz


def _multishoot_cw_latent(params, batch, x_dim, z_dim, hidden_dim, n_windows,
                          solver, remat, unroll, channel_impl):
    """Windowed latent solve shared by both channel-wise variants. The
    ``[B, xd, h]`` latent state folds into the generic window machinery
    flattened to ``[B, xd*h]``. Returns ``(call, xh_sol [T,B,xd,h], gaps)``.
    """
    h = hidden_dim
    call, tT, xh_true, f_init, fz = _cw_prep(
        params, batch, x_dim, z_dim, h, channel_impl
    )
    T, B = tT.shape[0], tT.shape[1]
    K = n_windows
    _check_windows(T, K)
    f_init_f = jnp.tile(f_init, (K, 1, 1))

    def de_fn(tt, xx, zz):
        dot = call(
            "dyn", f_init_f, xx.reshape(-1, x_dim, h), zz.reshape(-1, z_dim, h)
        )
        return dot.reshape(xx.shape)

    xh_sol_flat, gaps = multishoot_ode(
        solver, de_fn, tT, xh_true.reshape(T, B, x_dim * h),
        fz.reshape(T - 1, B, z_dim * h), K, remat=remat, unroll=unroll,
    )
    return call, xh_sol_flat.reshape(T, B, x_dim, h), gaps


def multishoot_cw_ode_apply(
    params: Dict,
    batch: Dict,
    x_dim: int,
    z_dim: int,
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    remat=True,
    unroll: int = 1,
    channel_impl: str = "einsum",
):
    """Multi-shooting for the channel-wise ODE.

    Returns ``((x_pred [B,T,xd], x_re), gaps [K-1, B, xd*h])`` — the
    ``ChannelWiseODEModel.__call__`` output contract plus latent gaps.
    """
    call, xh_sol, gaps = _multishoot_cw_latent(
        params, batch, x_dim, z_dim, hidden_dim, n_windows,
        solver, remat, unroll, channel_impl,
    )
    x_pred = call("decode_x", xh_sol)  # [T, B, xd]
    x_re = call("decode_x", call("encode_x", batch["x"]))  # [B, T, xd]
    return (_tm(x_pred), x_re), gaps


def multishoot_cw_dae_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    n_windows: int,
    solver: str = "euler",
    remat=True,
    unroll: int = 1,
    channel_impl: str = "einsum",
):
    """Multi-shooting for the channel-wise DAE: the dynamics are the latent
    ODE above (no algebraic feedback in this family, ref neural_base.py:110)
    and the channel-wise algebraic readout runs decoupled over the stitched
    latent solution with RAW ``v`` (matching ``ChannelWiseDAEModel``).

    Returns ``((x_pred, i_pred, x_re), gaps [K-1, B, xd*h])``.
    """
    xd, zd, vd, idim = dims
    h = hidden_dim
    call, xh_sol, gaps = _multishoot_cw_latent(
        params, batch, xd, zd, h, n_windows, solver, remat, unroll,
        channel_impl,
    )
    x_pred = call("decode_x", xh_sol)  # [T, B, xd]
    x_re = call("decode_x", call("encode_x", batch["x"]))  # [B, T, xd]
    ae = ChannelWiseAEFunc(
        x_dim=xd, v_dim=vd, i_dim=idim, hidden_dim=h, impl=channel_impl
    )
    i_pred = ae.apply(
        {"params": params["params"]["ae_func"]}, xh_sol, _tm(batch["v"])
    )  # [T, B, id]
    return (_tm(x_pred), _tm(i_pred), x_re), gaps
