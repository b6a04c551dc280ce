"""Pallas fused-scan kernels for ODE rollouts (forward + custom-VJP
backward), depth-generic.

Slimmer sibling of :mod:`py_psnode_tpu.ops.fused_dae`: one dynamics net, one
carry, and — because ODE events only substitute the exogenous input stream —
no in-kernel event handling at all (the jumped stream is folded into the
precomputed layer-1 projections). Supports any tail depth, so both the
4-layer no-encode dynamics and the 2-layer direct-encode latent dynamics run
through it. Semantics pinned to :func:`py_psnode_tpu.solvers.integrate_ode`
(ref my_solvers.py:52-80).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from py_psnode_tpu.ops.fused_dae import (
    _dot,
    mlp_tail_fwd,
    mlp_tail_fwd_multi,
    mlp_tail_layers,
    normalize_solver,
    pad_time as _pad_time,
    split_de_layer1,
    time_blocking as _time_blocking,
)
from py_psnode_tpu.ops.fused_dae_vjp import _dot_t, _tail_bwd, _tail_fwd_res

_ONE_THIRD = 1.0 / 3.0


def precompute_ode_streams(
    params: Dict,
    all_initial: jnp.ndarray,
    z_step: jnp.ndarray,
    x_dim: int,
    de_path: Tuple[str, str] = ("de_func", "x_dot"),
):
    """Lift the init contribution and z projections out of the loop.

    Returns ``(s_de [T-1,B,h], weights)`` with ``weights = {wx_de, de_tail}``.
    """
    de = params[de_path[0]][de_path[1]]
    d_u = all_initial.shape[-1]
    W1, b1 = de["dense_0"]["kernel"], de["dense_0"]["bias"]
    Winit, Wu, b1 = split_de_layer1(W1, b1, d_u)
    c = all_initial @ Winit + b1
    s_de = c[None] + z_step @ Wu[x_dim:]
    return s_de, dict(wx_de=Wu[:x_dim], de_tail=mlp_tail_layers(de))


def _cast_ode(s_de, weights, precision):
    """bf16 kernel compute mode (see fused_dae.cast_compute): casts the
    layer-1 stream and 2-D weights; biases/carries/accumulation stay f32."""
    if precision not in ("bfloat16", "bf16"):
        return s_de, weights
    bf = jnp.bfloat16
    return s_de.astype(bf), dict(
        wx_de=weights["wx_de"].astype(bf),
        de_tail=[(W.astype(bf), b) for W, b in weights["de_tail"]],
    )


def _flatten(weights):
    flat = [weights["wx_de"]]
    for W, b in weights["de_tail"]:
        flat += [W, b]
    return flat, len(weights["de_tail"])


def _unflatten(flat, n_tail):
    it = iter(flat[1:])
    return dict(
        wx_de=flat[0], de_tail=[(next(it), next(it)) for _ in range(n_tail)]
    )


def _step_fwd(f, x0, dt, solver):
    """One explicit step of the selected tableau (shared by the kernels)."""
    if solver == "euler":
        return x0 + dt * f(x0)
    if solver == "midpoint":
        f0 = f(x0)
        return x0 + dt * f(x0 + f0 * (0.5 * dt))
    if solver == "rk4":
        k1 = f(x0)
        k2 = f(x0 + dt * k1 * _ONE_THIRD)
        k3 = f(x0 + dt * (k2 - k1 * _ONE_THIRD))
        k4 = f(x0 + dt * (k1 - k2 + k3))
        return x0 + (k1 + 3.0 * (k2 + k3) + k4) * dt * 0.125
    raise ValueError(solver)  # pragma: no cover


def _step_fwd_multi(f_multi, xs, dts, solver):
    """Lane-interleaved :func:`_step_fwd` over lists of lane states."""
    L = len(xs)
    if solver == "euler":
        fs = f_multi(xs)
        return [xs[l] + dts[l] * fs[l] for l in range(L)]
    if solver == "midpoint":
        f0 = f_multi(xs)
        fm = f_multi([xs[l] + f0[l] * (0.5 * dts[l]) for l in range(L)])
        return [xs[l] + dts[l] * fm[l] for l in range(L)]
    if solver == "rk4":
        k1 = f_multi(xs)
        k2 = f_multi([xs[l] + dts[l] * k1[l] * _ONE_THIRD for l in range(L)])
        k3 = f_multi(
            [xs[l] + dts[l] * (k2[l] - k1[l] * _ONE_THIRD) for l in range(L)]
        )
        k4 = f_multi([xs[l] + dts[l] * (k1[l] - k2[l] + k3[l]) for l in range(L)])
        return [
            xs[l]
            + (k1[l] + 3.0 * (k2[l] + k3[l]) + k4[l]) * dts[l] * 0.125
            for l in range(L)
        ]
    raise ValueError(solver)  # pragma: no cover


def _fwd_kernel(*refs, solver: str, n_tail: int, tb: int, n_lanes: int = 1):
    """Forward kernel, TIME-BLOCKED: each grid iteration advances ``tb``
    solver steps from VMEM-resident state. The per-step matmuls here are
    tiny ([bB,h]@[h,h]), so a 1-step grid is dominated by grid/DMA
    sequencing overhead — unrolling tb steps per iteration amortizes it.
    ``n_lanes`` > 1 splits the batch block into independent sub-blocks
    advanced in lockstep (see :func:`mlp_tail_fwd_multi`)."""
    s_de_ref, dt_ref, x0_ref = refs[:3]
    w = refs[3 : 3 + 1 + 2 * n_tail]
    wx_ref, tail = w[0], w[1:]
    xsol_ref, x_c = refs[3 + 1 + 2 * n_tail :]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        x_c[:] = x0_ref[:]

    if n_lanes == 1:
        x = x_c[:]
        for u in range(tb):
            f = lambda xx: mlp_tail_fwd(s_de_ref[u] + _dot(xx, wx_ref[:]), tail)
            x = _step_fwd(f, x, dt_ref[u], solver)
            xsol_ref[u] = x
        x_c[:] = x
        return

    bB = x_c.shape[0]
    sub = bB // n_lanes
    sl = [slice(l * sub, (l + 1) * sub) for l in range(n_lanes)]
    xs = [x_c[s] for s in sl]
    for u in range(tb):
        s_u = s_de_ref[u]
        dt_u = dt_ref[u]

        def f_multi(xl, s_u=s_u):
            pres = [s_u[s] + _dot(x, wx_ref[:]) for s, x in zip(sl, xl)]
            return mlp_tail_fwd_multi(pres, tail)

        xs = _step_fwd_multi(f_multi, xs, [dt_u[s] for s in sl], solver)
        for s, x in zip(sl, xs):
            xsol_ref[u, s] = x
    for s, x in zip(sl, xs):
        x_c[s] = x


def _bwd_kernel(*refs, solver: str, n_tail: int, tb: int):
    s_de_ref, dt_ref, xt_ref, dX_ref = refs[:4]
    w = refs[4 : 4 + 1 + 2 * n_tail]
    wx_ref, tail = w[0], w[1:]
    cdtype = wx_ref.dtype  # bf16 compute mode rides the weights' dtype
    outs = refs[4 + 1 + 2 * n_tail :]
    gs_de_ref = outs[0]
    gw = outs[1 : 2 + 2 * n_tail]
    d_wx_ref, d_tail = gw[0], gw[1:]
    g_x0_ref = outs[2 + 2 * n_tail]
    gx_c = outs[3 + 2 * n_tail]

    b = pl.program_id(0)
    s = pl.program_id(1)
    n = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        gx_c[:] = jnp.zeros_like(gx_c)

    @pl.when((s == 0) & (b == 0))
    def _():
        for r in gw:
            r[:] = jnp.zeros_like(r)

    def F_fwd(x, u):
        out, res = _tail_fwd_res(s_de_ref[u] + _dot(x, wx_ref[:]), tail)
        return out, (x, res)

    def F_bwd(xres, gf):
        x, res = xres
        gp1 = _tail_bwd(res, gf, tail, d_tail, cdtype)
        d_wx_ref[:] += _dot_t(x, gp1, cdtype)
        return _dot(gp1, wx_ref[:].T), gp1

    gx = gx_c[:]
    for u in reversed(range(tb)):
        x0 = xt_ref[u]
        dt = dt_ref[u]
        gX1 = dX_ref[u] + gx

        if solver == "euler":
            _, res = F_fwd(x0, u)
            g_x, gp1 = F_bwd(res, dt * gX1)
            g_x0 = gX1 + g_x
            gs_de = gp1
        elif solver == "midpoint":
            f0, res0 = F_fwd(x0, u)
            x_mid = x0 + f0 * (0.5 * dt)
            _, res_m = F_fwd(x_mid, u)
            g_xmid, gp_m = F_bwd(res_m, dt * gX1)
            g_x00, gp_0 = F_bwd(res0, (0.5 * dt) * g_xmid)
            g_x0 = gX1 + g_xmid + g_x00
            gs_de = gp_m + gp_0
        elif solver == "rk4":
            k1, res1 = F_fwd(x0, u)
            a2 = x0 + dt * k1 * _ONE_THIRD
            k2, res2 = F_fwd(a2, u)
            a3 = x0 + dt * (k2 - k1 * _ONE_THIRD)
            k3, res3 = F_fwd(a3, u)
            a4 = x0 + dt * (k1 - k2 + k3)
            _, res4 = F_fwd(a4, u)

            G = gX1
            c = dt * 0.125
            g_k1, g_k2, g_k3, g_k4 = G * c, 3.0 * G * c, 3.0 * G * c, G * c
            g_x0 = G
            gs_de = jnp.zeros_like(s_de_ref[u])

            g_a4, gp = F_bwd(res4, g_k4)
            g_x0 += g_a4
            g_k1 += dt * g_a4
            g_k2 -= dt * g_a4
            g_k3 += dt * g_a4
            gs_de += gp

            g_a3, gp = F_bwd(res3, g_k3)
            g_x0 += g_a3
            g_k2 += dt * g_a3
            g_k1 -= dt * g_a3 * _ONE_THIRD
            gs_de += gp

            g_a2, gp = F_bwd(res2, g_k2)
            g_x0 += g_a2
            g_k1 += dt * g_a2 * _ONE_THIRD
            gs_de += gp

            g_x1_, gp = F_bwd(res1, g_k1)
            g_x0 += g_x1_
            gs_de += gp
        else:  # pragma: no cover
            raise ValueError(solver)

        gs_de_ref[u] = gs_de
        gx = g_x0

    gx_c[:] = gx

    @pl.when(s == n - 1)
    def _():
        g_x0_ref[:] = gx_c[:]


def _specs(nT, B, h, reverse, tb, bB):
    nB = B // bB
    if reverse:
        step = lambda d: pl.BlockSpec(
            (tb, bB, d), lambda b, s: (nT - 1 - s, b, 0), memory_space=pltpu.VMEM
        )
    else:
        step = lambda d: pl.BlockSpec(
            (tb, bB, d), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM
        )
    bspec = lambda d: pl.BlockSpec(
        (bB, d), lambda b, t: (b, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return bB, nB, step, bspec, full


def _forward(s_de, weights, x0, dt, solver, interpret, precision="default"):
    from py_psnode_tpu.ops.fused_dae import choose_blocks

    s_de, weights = _cast_ode(s_de, weights, precision)
    Tm1, B, h = s_de.shape
    xd = x0.shape[-1]
    bB, tb0 = choose_blocks(B, h, n_streams=2)  # s_de in + xsol out
    tb, nT, pad = _time_blocking(Tm1, tb0)
    bB, nB, step, bspec, full = _specs(nT, B, h, reverse=False, tb=tb, bB=bB)
    wflat, n_tail = _flatten(weights)
    from py_psnode_tpu.ops.fused_dae import FWD_LANES

    lanes = max(FWD_LANES, 1)  # 0/negative overrides must not reach the kernel
    n_lanes = lanes if bB % lanes == 0 else 1
    xs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, solver=solver, n_tail=n_tail, tb=tb, n_lanes=n_lanes
        ),
        grid=(nB, nT),
        in_specs=[step(h), step(1), bspec(xd)] + [full(wk.shape) for wk in wflat],
        out_specs=step(xd),
        out_shape=jax.ShapeDtypeStruct((nT * tb, B, xd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bB, xd), jnp.float32)],
        interpret=interpret,
    )(_pad_time(s_de, pad), _pad_time(dt, pad), x0, *wflat)
    return jnp.concatenate([x0[None], xs[:Tm1]], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_ode_rollout_diff(s_de, weights, x0, dt, solver, interpret,
                           precision="default"):
    """Differentiable fused ODE rollout.

    ``s_de [T-1,B,h]`` precomputed layer-1 stream (event-adjusted),
    ``weights`` from :func:`precompute_ode_streams`, ``x0 [B, xd]``.
    Returns ``[T, B, xd]`` solution including the initial row.
    ``precision="bfloat16"`` selects the bf16 kernel compute mode in both
    kernels; cotangents stay f32.
    """
    return _forward(s_de, weights, x0, dt, solver, interpret, precision)


def _fwd(s_de, weights, x0, dt, solver, interpret, precision="default"):
    # keep the CAST stream/weights as residuals so the backward kernel
    # recomputes exactly what the forward computed
    s_de, weights = _cast_ode(s_de, weights, precision)
    sol = _forward(s_de, weights, x0, dt, solver, interpret)
    return sol, (s_de, weights, x0, dt, sol)


def _bwd(solver, interpret, precision, residuals, g_sol):
    from py_psnode_tpu.ops.fused_dae import choose_blocks

    s_de, weights, x0, dt, sol = residuals
    Tm1, B, h = s_de.shape
    xd = x0.shape[-1]
    # kind="bwd" resolves the BWD_CAP knob (default 128 — the bwd-kernel
    # compiler RET_CHECK boundary; see choose_blocks)
    bB, tb0 = choose_blocks(B, h, n_streams=3, kind="bwd")
    tb, nT, pad = _time_blocking(Tm1, tb0)
    bB, nB, step, bspec, full = _specs(nT, B, h, reverse=True, tb=tb, bB=bB)
    wflat, n_tail = _flatten(weights)
    gshape = lambda wk: wk.shape if wk.ndim == 2 else (1, wk.shape[0])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, solver=solver, n_tail=n_tail, tb=tb),
        grid=(nB, nT),
        in_specs=[step(h), step(1), step(xd), step(xd)]
        + [full(wk.shape) for wk in wflat],
        out_specs=(
            step(h),
            *[full(gshape(wk)) for wk in wflat],
            bspec(xd),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nT * tb, B, h), jnp.float32),
            *[jax.ShapeDtypeStruct(gshape(wk), jnp.float32) for wk in wflat],
            jax.ShapeDtypeStruct((B, xd), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bB, xd), jnp.float32)],
        interpret=interpret,
    )(
        _pad_time(s_de, pad),
        _pad_time(dt, pad),
        _pad_time(sol[:-1], pad),
        _pad_time(g_sol[1:], pad),
        *wflat,
    )
    gs_de = outs[0][:Tm1]
    gw_flat = [
        arr if wk.ndim == 2 else arr[0]
        for wk, arr in zip(wflat, outs[1 : 1 + len(wflat)])
    ]
    gw = _unflatten(gw_flat, n_tail)
    g_x0 = outs[-1] + g_sol[0]
    return gs_de, gw, g_x0, jnp.zeros_like(dt)


fused_ode_rollout_diff.defvjp(_fwd, _bwd)


def fused_ode_apply(
    params: Dict,
    batch: Dict,
    x_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Drop-in replacement for ``ODEModel.apply`` in rollout mode.

    Returns batch-major ``x_pred`` (same contract as the model,
    ref neural_00_ODE_01_no_encode.py:78-91).
    """
    from py_psnode_tpu.solvers import event_match, jumped_stream

    solver = normalize_solver(solver)
    p = params["params"]
    tm = lambda a: jnp.swapaxes(a, 0, 1)
    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = tm(
        jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    )[:-1]
    tT, xT, zT = tm(batch["t"]).astype(jnp.float32), tm(batch["x"]), tm(batch["z"])
    all_initial = jnp.concatenate([xT[0], zT[0]], axis=-1)
    s_de, weights = precompute_ode_streams(p, all_initial, z_used, x_dim)
    dt = tT[1:] - tT[:-1]
    sol = fused_ode_rollout_diff(
        s_de, weights, xT[0], dt, solver, interpret, precision
    )
    return tm(sol)


def fused_ode_encode_apply(
    params: Dict,
    batch: Dict,
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Fused forward for the ODE direct-encode variant
    (ref neural_00_ODE_02_direct_encode.py:60-89): codecs run in XLA, the
    latent 2-layer dynamics rolls out through the fused kernel, events jump
    in latent space. Returns ``(x_pred, x_re)`` batch-major."""
    from py_psnode_tpu.models.funcs import Codec
    from py_psnode_tpu.solvers import event_match, jumped_stream

    solver = normalize_solver(solver)
    h = hidden_dim
    p = params["params"]
    tm = lambda a: jnp.swapaxes(a, 0, 1)
    # codecs are two-layer; the decoder's final kernel gives the raw width
    x_dim = p["x_decoder"]["net"]["dense_1"]["kernel"].shape[-1]
    x_enc = lambda a: Codec((h, h)).apply({"params": p["x_encoder"]}, a)
    x_dec = lambda a: Codec((h, x_dim)).apply({"params": p["x_decoder"]}, a)
    z_enc = lambda a: Codec((h, h)).apply({"params": p["z_encoder"]}, a)

    xh = x_enc(batch["x"])
    zh = z_enc(batch["z"])
    zh_jump = (
        z_enc(batch["z_jump"]) if batch.get("z_jump") is not None else None
    )
    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    zh_used = tm(jumped_stream(zh, zh_jump, is_event, e_idx))[:-1]
    tT, xhT, zhT = tm(batch["t"]).astype(jnp.float32), tm(xh), tm(zh)
    all_initial = jnp.concatenate([xhT[0], zhT[0]], axis=-1)
    s_de, weights = precompute_ode_streams(p, all_initial, zh_used, h)
    dt = tT[1:] - tT[:-1]
    xh_sol = fused_ode_rollout_diff(
        s_de, weights, xhT[0], dt, solver, interpret, precision
    )
    x_pred = x_dec(tm(xh_sol))
    x_re = x_dec(xh)
    return x_pred, x_re
