"""Pallas fused-scan kernels for the ODE no-encode rollout (forward +
custom-VJP backward).

Slimmer sibling of :mod:`py_psnode_tpu.ops.fused_dae`: one dynamics net, one
carry, and — because ODE events only substitute the exogenous input stream —
no in-kernel event handling at all (the jumped stream is folded into the
precomputed layer-1 projections). Semantics pinned to
:func:`py_psnode_tpu.solvers.integrate_ode` (ref my_solvers.py:52-80).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from py_psnode_tpu.ops.fused_dae import (
    _dot,
    _elu,
    pick_batch_block,
    split_de_layer1,
)

_ONE_THIRD = 1.0 / 3.0

W_ORDER = ("wx_de", "w2", "b2", "w3", "b3", "w4", "b4")


def _delu(p):
    return jnp.where(p > 0, 1.0, jnp.exp(jnp.minimum(p, 0.0)))


def precompute_ode_streams(
    params: Dict, all_initial: jnp.ndarray, z_step: jnp.ndarray, x_dim: int
):
    """Lift the init contribution and z projections out of the loop.

    ``params``: flax subtree with ``de_func/x_dot/dense_*``;
    ``all_initial``: ``[B, xd+zd]``; ``z_step``: ``[T-1, B, zd]``
    (event-adjusted). Returns ``(s_de [T-1,B,h], weights)``.
    """
    de = params["de_func"]["x_dot"]
    d_u = all_initial.shape[-1]
    W1, b1 = de["dense_0"]["kernel"], de["dense_0"]["bias"]
    Winit, Wu, b1 = split_de_layer1(W1, b1, d_u)
    Wx = Wu[:x_dim]
    Wz = Wu[x_dim:]
    c = all_initial @ Winit + b1
    s_de = c[None] + z_step @ Wz
    weights = dict(
        wx_de=Wx,
        w2=de["dense_1"]["kernel"], b2=de["dense_1"]["bias"],
        w3=de["dense_2"]["kernel"], b3=de["dense_2"]["bias"],
        w4=de["dense_3"]["kernel"], b4=de["dense_3"]["bias"],
    )
    return s_de, weights


def _fwd_kernel(
    s_de_ref, dt_ref, x0_ref,
    wx_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
    xsol_ref, x_c, *, solver: str,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        x_c[:] = x0_ref[:]

    x0 = x_c[:]

    def f(x):
        h1 = _elu(s_de_ref[0] + _dot(x, wx_ref[:]))
        h2 = _elu(_dot(h1, w2_ref[:]) + b2_ref[:])
        h3 = _elu(_dot(h2, w3_ref[:]) + b3_ref[:])
        return _dot(h3, w4_ref[:]) + b4_ref[:]

    dt = dt_ref[0]
    if solver == "euler":
        x1 = x0 + dt * f(x0)
    elif solver == "rk4":
        k1 = f(x0)
        k2 = f(x0 + dt * k1 * _ONE_THIRD)
        k3 = f(x0 + dt * (k2 - k1 * _ONE_THIRD))
        k4 = f(x0 + dt * (k1 - k2 + k3))
        x1 = x0 + (k1 + 3.0 * (k2 + k3) + k4) * dt * 0.125
    else:  # pragma: no cover
        raise ValueError(solver)
    x_c[:] = x1
    xsol_ref[0] = x1


def _bwd_kernel(
    s_de_ref, dt_ref, xt_ref, dX_ref,
    wx_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
    gs_de_ref, d_wx_ref, d_w2_ref, d_b2_ref, d_w3_ref, d_b3_ref,
    d_w4_ref, d_b4_ref, g_x0_ref,
    gx_c, *, solver: str,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    n = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        gx_c[:] = jnp.zeros_like(gx_c)

    @pl.when((s == 0) & (b == 0))
    def _():
        for r in (d_wx_ref, d_w2_ref, d_b2_ref, d_w3_ref, d_b3_ref,
                  d_w4_ref, d_b4_ref):
            r[:] = jnp.zeros_like(r)

    x0 = xt_ref[0]
    dt = dt_ref[0]
    gX1 = dX_ref[0] + gx_c[:]

    def F_fwd(x):
        p1 = s_de_ref[0] + _dot(x, wx_ref[:])
        h1 = _elu(p1)
        p2 = _dot(h1, w2_ref[:]) + b2_ref[:]
        h2 = _elu(p2)
        p3 = _dot(h2, w3_ref[:]) + b3_ref[:]
        h3 = _elu(p3)
        f = _dot(h3, w4_ref[:]) + b4_ref[:]
        return f, (x, p1, h1, p2, h2, p3, h3)

    def F_bwd(res, gf):
        x, p1, h1, p2, h2, p3, h3 = res
        d_w4_ref[:] += _dot(h3.T, gf)
        d_b4_ref[:] += jnp.sum(gf, axis=0, keepdims=True)
        gp3 = _dot(gf, w4_ref[:].T) * _delu(p3)
        d_w3_ref[:] += _dot(h2.T, gp3)
        d_b3_ref[:] += jnp.sum(gp3, axis=0, keepdims=True)
        gp2 = _dot(gp3, w3_ref[:].T) * _delu(p2)
        d_w2_ref[:] += _dot(h1.T, gp2)
        d_b2_ref[:] += jnp.sum(gp2, axis=0, keepdims=True)
        gp1 = _dot(gp2, w2_ref[:].T) * _delu(p1)
        d_wx_ref[:] += _dot(x.T, gp1)
        return _dot(gp1, wx_ref[:].T), gp1

    if solver == "euler":
        _, res = F_fwd(x0)
        g_x, gp1 = F_bwd(res, dt * gX1)
        g_x0 = gX1 + g_x
        gs_de = gp1
    elif solver == "rk4":
        k1, res1 = F_fwd(x0)
        a2 = x0 + dt * k1 * _ONE_THIRD
        k2, res2 = F_fwd(a2)
        a3 = x0 + dt * (k2 - k1 * _ONE_THIRD)
        k3, res3 = F_fwd(a3)
        a4 = x0 + dt * (k1 - k2 + k3)
        _, res4 = F_fwd(a4)

        G = gX1
        c = dt * 0.125
        g_k1, g_k2, g_k3, g_k4 = G * c, 3.0 * G * c, 3.0 * G * c, G * c
        g_x0 = G
        gs_de = jnp.zeros_like(s_de_ref[0])

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

    gs_de_ref[0] = gs_de
    gx_c[:] = g_x0

    @pl.when(s == n - 1)
    def _():
        g_x0_ref[:] = gx_c[:]


def _specs(Tm1, B, h, xd, weights, reverse):
    bB = pick_batch_block(B)
    nB = B // bB
    if reverse:
        step = lambda d: pl.BlockSpec(
            (1, bB, d), lambda b, s: (Tm1 - 1 - s, b, 0), memory_space=pltpu.VMEM
        )
    else:
        step = lambda d: pl.BlockSpec(
            (1, bB, d), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM
        )
    bspec = lambda d: pl.BlockSpec(
        (bB, d), lambda b, t: (b, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return bB, nB, step, bspec, full


def _forward(s_de, weights, x0, dt, solver, interpret):
    Tm1, B, h = s_de.shape
    xd = x0.shape[-1]
    bB, nB, step, bspec, full = _specs(Tm1, B, h, xd, weights, reverse=False)
    xs = pl.pallas_call(
        functools.partial(_fwd_kernel, solver=solver),
        grid=(nB, Tm1),
        in_specs=[step(h), step(1), bspec(xd)]
        + [full(weights[k].shape) for k in W_ORDER],
        out_specs=step(xd),
        out_shape=jax.ShapeDtypeStruct((Tm1, B, xd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bB, xd), jnp.float32)],
        interpret=interpret,
    )(s_de, dt, x0, *[weights[k] for k in W_ORDER])
    return jnp.concatenate([x0[None], xs], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_ode_rollout_diff(s_de, weights, x0, dt, solver, interpret):
    """Differentiable fused ODE rollout.

    ``s_de [T-1,B,h]`` precomputed layer-1 stream (event-adjusted),
    ``weights`` from :func:`precompute_ode_streams`, ``x0 [B, xd]``.
    Returns ``[T, B, xd]`` solution including the initial row.
    """
    return _forward(s_de, weights, x0, dt, solver, interpret)


def _fwd(s_de, weights, x0, dt, solver, interpret):
    sol = _forward(s_de, weights, x0, dt, solver, interpret)
    return sol, (s_de, weights, x0, dt, sol)


def _bwd(solver, interpret, residuals, g_sol):
    s_de, weights, x0, dt, sol = residuals
    Tm1, B, h = s_de.shape
    xd = x0.shape[-1]
    bB, nB, step, bspec, full = _specs(Tm1, B, h, xd, weights, reverse=True)
    wshapes = {k: weights[k].shape for k in W_ORDER}
    gshape = lambda k: wshapes[k] if len(wshapes[k]) == 2 else (1, wshapes[k][0])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, solver=solver),
        grid=(nB, Tm1),
        in_specs=[step(h), step(1), step(xd), step(xd)]
        + [full(wshapes[k]) for k in W_ORDER],
        out_specs=(
            step(h),
            *[full(gshape(k)) for k in W_ORDER],
            bspec(xd),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tm1, B, h), jnp.float32),
            *[jax.ShapeDtypeStruct(gshape(k), jnp.float32) for k in W_ORDER],
            jax.ShapeDtypeStruct((B, xd), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bB, xd), jnp.float32)],
        interpret=interpret,
    )(s_de, dt, sol[:-1], g_sol[1:], *[weights[k] for k in W_ORDER])
    gs_de = outs[0]
    gw = {}
    for k, arr in zip(W_ORDER, outs[1 : 1 + len(W_ORDER)]):
        gw[k] = arr if len(wshapes[k]) == 2 else arr[0]
    g_x0 = outs[-1] + g_sol[0]
    return gs_de, gw, g_x0, jnp.zeros_like(dt)


fused_ode_rollout_diff.defvjp(_fwd, _bwd)


def fused_ode_apply(
    params: Dict,
    batch: Dict,
    x_dim: int,
    solver: str = "euler",
    interpret: bool = False,
):
    """Drop-in replacement for ``ODEModel.apply`` in rollout mode.

    Returns batch-major ``x_pred`` (same contract as the model,
    ref neural_00_ODE_01_no_encode.py:78-91).
    """
    from py_psnode_tpu.solvers import event_match, jumped_stream

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
    sol = fused_ode_rollout_diff(s_de, weights, xT[0], dt, solver, interpret)
    return tm(sol)
