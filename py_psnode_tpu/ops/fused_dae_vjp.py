"""Custom-VJP training path for the fused Pallas DAE rollout.

The backward pass is a second Pallas kernel that walks the time grid in
REVERSE (grid index ``s`` maps to step ``t = T-2-s``), recomputing each
step's activations from the saved solution (rematerialization — the only
per-step residuals kept are the ``[T, B, xd]``/``[T, B, id]`` carries the
forward produces anyway) and accumulating:

  * weight/bias gradients in VMEM output blocks with constant index maps
    (zeroed at the first grid step, accumulated in place — the standard
    Pallas accumulator pattern);
  * per-step cotangents for the precomputed layer-1 streams
    (``g_s_de``/``g_s_ae``/``g_s_ae_ev``), which XLA then backpropagates
    through the big precompute matmuls outside the kernel;
  * the reverse-time carries ``dL/dx_t`` and ``dL/di_t`` (the lagged
    algebraic coupling makes ``i_t`` a second adjoint state).

Event steps are handled exactly as in the forward: the algebraic recompute
is re-evaluated under a predicated branch and its VJP routes the ``i_in``
cotangent to the event samples' ``x_t``/stream/weight gradients instead of
the ``i_t`` carry.

Gradients w.r.t. ``dt``/``ev`` are defined as zero (the time grid and event
schedule are data, not parameters — same stance as the XLA training path
where ``t`` never requires grad).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from py_psnode_tpu.ops.fused_dae import (
    _dot,
    _elu,
    fused_dae_rollout,
    pick_batch_block,
)

_ONE_THIRD = 1.0 / 3.0

W_ORDER = (
    "wx_de", "wi_de", "w2", "b2", "w3", "b3", "w4", "b4",
    "gx_ae", "g2", "c2", "g3", "c3", "g4", "c4",
)


def _delu(p):
    # ELU'(p): 1 for p>0, exp(p) for p<=0
    return jnp.where(p > 0, 1.0, jnp.exp(jnp.minimum(p, 0.0)))


def _bwd_kernel(
    any_ev_ref,
    # per-step streams (reverse-indexed)
    s_de_ref, s_ae_ref, s_ae_ev_ref, dt_ref, ev_ref,
    xt_ref, it_ref, x1_ref,  # x_t, i_t, x_{t+1} from the saved solution
    dX_ref, dI_ref,  # output cotangents for rows t+1
    # weights
    wx_de_ref, wi_de_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
    gx_ae_ref, g2_ref, c2_ref, g3_ref, c3_ref, g4_ref, c4_ref,
    # outputs: stream cotangents (per step)
    gs_de_ref, gs_ae_ref, gs_ae_ev_ref,
    # outputs: weight grads (accumulated, constant index maps)
    d_wx_ref, d_wi_ref, d_w2_ref, d_b2_ref, d_w3_ref, d_b3_ref,
    d_w4_ref, d_b4_ref, d_gx_ref, d_g2_ref, d_c2_ref, d_g3_ref, d_c3_ref,
    d_g4_ref, d_c4_ref,
    # outputs: initial-state cotangents (written at the last reverse step)
    g_x0_ref, g_i0_ref,
    # scratch: reverse carries + i_in buffer
    gx_c, gi_c, i_in_buf,
    *, solver: str,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    n = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        # reverse carries reset at each batch block's first reverse step
        gx_c[:] = jnp.zeros_like(gx_c)
        gi_c[:] = jnp.zeros_like(gi_c)

    @pl.when((s == 0) & (b == 0))
    def _():
        for r in (
            d_wx_ref, d_wi_ref, d_w2_ref, d_b2_ref, d_w3_ref, d_b3_ref,
            d_w4_ref, d_b4_ref, d_gx_ref, d_g2_ref, d_c2_ref, d_g3_ref,
            d_c3_ref, d_g4_ref, d_c4_ref,
        ):
            r[:] = jnp.zeros_like(r)

    t = n - 1 - s  # forward step index
    x0 = xt_ref[0]
    x1 = x1_ref[0]
    i_t = it_ref[0]
    dt = dt_ref[0]
    ev = ev_ref[0]

    # ---- recompute i_in exactly as the forward did ----
    def ae_fwd(x, s_row):
        p1 = s_row + _dot(x, gx_ae_ref[:])
        h1 = _elu(p1)
        p2 = _dot(h1, g2_ref[:]) + c2_ref[:]
        h2 = _elu(p2)
        p3 = _dot(h2, g3_ref[:]) + c3_ref[:]
        h3 = _elu(p3)
        y = _dot(h3, g4_ref[:]) + c4_ref[:]
        return y, (p1, h1, p2, h2, p3, h3)

    def ae_bwd(x, s_row, res, gy):
        """Accumulates AE weight grads; returns (g_x, g_s_row)."""
        p1, h1, p2, h2, p3, h3 = res
        d_g4_ref[:] += _dot(h3.T, gy)
        d_c4_ref[:] += jnp.sum(gy, axis=0, keepdims=True)
        gh3 = _dot(gy, g4_ref[:].T)
        gp3 = gh3 * _delu(p3)
        d_g3_ref[:] += _dot(h2.T, gp3)
        d_c3_ref[:] += jnp.sum(gp3, axis=0, keepdims=True)
        gh2 = _dot(gp3, g3_ref[:].T)
        gp2 = gh2 * _delu(p2)
        d_g2_ref[:] += _dot(h1.T, gp2)
        d_c2_ref[:] += jnp.sum(gp2, axis=0, keepdims=True)
        gh1 = _dot(gp2, g2_ref[:].T)
        gp1 = gh1 * _delu(p1)
        d_gx_ref[:] += _dot(x.T, gp1)
        return _dot(gp1, gx_ae_ref[:].T), gp1

    i_in_buf[:] = i_t

    @pl.when(any_ev_ref[t] == 1)
    def _():
        i_ev, _res = ae_fwd(x0, s_ae_ev_ref[0])
        i_in_buf[:] = jnp.where(ev > 0.0, i_ev, i_in_buf[:])

    i_in = i_in_buf[:]
    i_proj = _dot(i_in, wi_de_ref[:])

    # ---- incoming cotangents for x_{t+1}, i_{t+1} ----
    gX1 = dX_ref[0] + gx_c[:]
    gI1 = dI_ref[0] + gi_c[:]

    # ---- AE at t+1: i_{t+1} = AE(x_{t+1}; s_ae[t]) ----
    _, res_ae = ae_fwd(x1, s_ae_ref[0])
    g_x1_ae, gp1_ae = ae_bwd(x1, s_ae_ref[0], res_ae, gI1)
    gs_ae_ref[0] = gp1_ae
    gX1 = gX1 + g_x1_ae

    # ---- differential step backward ----
    def F_fwd(x):
        p1 = s_de_ref[0] + _dot(x, wx_de_ref[:]) + i_proj
        h1 = _elu(p1)
        p2 = _dot(h1, w2_ref[:]) + b2_ref[:]
        h2 = _elu(p2)
        p3 = _dot(h2, w3_ref[:]) + b3_ref[:]
        h3 = _elu(p3)
        f = _dot(h3, w4_ref[:]) + b4_ref[:]
        return f, (x, p1, h1, p2, h2, p3, h3)

    def F_bwd(res, gf):
        """Accumulates DE weight grads; returns (g_x, g_i_in, g_s_de)."""
        x, p1, h1, p2, h2, p3, h3 = res
        d_w4_ref[:] += _dot(h3.T, gf)
        d_b4_ref[:] += jnp.sum(gf, axis=0, keepdims=True)
        gh3 = _dot(gf, w4_ref[:].T)
        gp3 = gh3 * _delu(p3)
        d_w3_ref[:] += _dot(h2.T, gp3)
        d_b3_ref[:] += jnp.sum(gp3, axis=0, keepdims=True)
        gh2 = _dot(gp3, w3_ref[:].T)
        gp2 = gh2 * _delu(p2)
        d_w2_ref[:] += _dot(h1.T, gp2)
        d_b2_ref[:] += jnp.sum(gp2, axis=0, keepdims=True)
        gh1 = _dot(gp2, w2_ref[:].T)
        gp1 = gh1 * _delu(p1)
        d_wx_ref[:] += _dot(x.T, gp1)
        d_wi_ref[:] += _dot(i_in.T, gp1)
        return _dot(gp1, wx_de_ref[:].T), _dot(gp1, wi_de_ref[:].T), gp1

    if solver == "euler":
        _, res = F_fwd(x0)
        g_f = dt * gX1
        g_x, g_i_in, gp1 = F_bwd(res, g_f)
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
        g_k1 = G * c
        g_k2 = 3.0 * G * c
        g_k3 = 3.0 * G * c
        g_k4 = G * c
        g_x0 = G
        g_i_in = jnp.zeros_like(i_in)
        gs_de = jnp.zeros_like(s_de_ref[0])

        g_a4, gi4, gp14 = F_bwd(res4, g_k4)
        g_x0 += g_a4
        g_k1 += dt * g_a4
        g_k2 -= dt * g_a4
        g_k3 += dt * g_a4
        g_i_in += gi4
        gs_de += gp14

        g_a3, gi3, gp13 = F_bwd(res3, g_k3)
        g_x0 += g_a3
        g_k2 += dt * g_a3
        g_k1 -= dt * g_a3 * _ONE_THIRD
        g_i_in += gi3
        gs_de += gp13

        g_a2, gi2, gp12 = F_bwd(res2, g_k2)
        g_x0 += g_a2
        g_k1 += dt * g_a2 * _ONE_THIRD
        g_i_in += gi2
        gs_de += gp12

        g_x1_, gi1, gp11 = F_bwd(res1, g_k1)
        g_x0 += g_x1_
        g_i_in += gi1
        gs_de += gp11
    else:  # pragma: no cover
        raise ValueError(solver)

    gs_de_ref[0] = gs_de

    # ---- route the i_in cotangent: event samples → AE_ev VJP, rest → i_t ----
    gs_ae_ev_ref[0] = jnp.zeros_like(gs_ae_ev_ref[0])
    gi_c[:] = g_i_in

    @pl.when(any_ev_ref[t] == 1)
    def _():
        g_ev_part = jnp.where(ev > 0.0, g_i_in, 0.0)
        _, res_ev = ae_fwd(x0, s_ae_ev_ref[0])
        g_x_ev, gp1_ev = ae_bwd(x0, s_ae_ev_ref[0], res_ev, g_ev_part)
        gs_ae_ev_ref[0] = gp1_ev
        gx_c_cur = g_x0 + g_x_ev
        gx_c[:] = gx_c_cur  # include event contribution in the x carry
        gi_c[:] = jnp.where(ev > 0.0, 0.0, g_i_in)

    @pl.when(any_ev_ref[t] == 0)
    def _():
        gx_c[:] = g_x0

    @pl.when(s == n - 1)
    def _():
        g_x0_ref[:] = gx_c[:]
        g_i0_ref[:] = gi_c[:]


def _run_backward(
    streams, weights, x0, i0, dt, ev, x_solution, i_solution, dX, dI, *,
    solver, interpret, block_b=128,
):
    s_de, s_ae, s_ae_ev = streams["s_de"], streams["s_ae"], streams["s_ae_ev"]
    Tm1, B, h = s_de.shape
    xd = x0.shape[-1]
    idim = i0.shape[-1]
    ev_f = ev.astype(jnp.float32)[..., None]
    any_ev = jnp.any(ev, axis=-1).astype(jnp.int32)
    bB = pick_batch_block(B, block_b)
    nB = B // bB

    rev = lambda d: pl.BlockSpec(
        (1, bB, d), lambda b, s, *_: (Tm1 - 1 - s, b, 0), memory_space=pltpu.VMEM
    )
    rev_p1 = lambda d: pl.BlockSpec(  # row t+1 of a [T, B, d] array
        (1, bB, d), lambda b, s, *_: (Tm1 - s, b, 0), memory_space=pltpu.VMEM
    )
    bspec = lambda d: pl.BlockSpec(
        (bB, d), lambda b, s, *_: (b, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, s, *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    in_specs = [
        rev(h), rev(h), rev(h), rev(1), rev(1),
        rev(xd),      # x_t   (rows 0..T-2 of x_solution)
        rev(idim),    # i_t
        rev_p1(xd),   # x_{t+1}
        rev(xd),      # dX (cotangent rows for t+1, stored 0..T-2)
        rev(idim),    # dI
    ] + [full(weights[k].shape) for k in W_ORDER]

    wshapes = {k: weights[k].shape for k in W_ORDER}
    gshape = lambda k: (
        wshapes[k] if len(wshapes[k]) == 2 else (1, wshapes[k][0])
    )
    out_shape = (
        jax.ShapeDtypeStruct((Tm1, B, h), jnp.float32),  # g_s_de
        jax.ShapeDtypeStruct((Tm1, B, h), jnp.float32),  # g_s_ae
        jax.ShapeDtypeStruct((Tm1, B, h), jnp.float32),  # g_s_ae_ev
        *[jax.ShapeDtypeStruct(gshape(k), jnp.float32) for k in W_ORDER],
        jax.ShapeDtypeStruct((B, xd), jnp.float32),  # g_x0
        jax.ShapeDtypeStruct((B, idim), jnp.float32),  # g_i0
    )
    out_specs = (
        rev(h), rev(h), rev(h),
        *[full(gshape(k)) for k in W_ORDER],
        bspec(xd), bspec(idim),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nB, Tm1),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bB, xd), jnp.float32),
            pltpu.VMEM((bB, idim), jnp.float32),
            pltpu.VMEM((bB, idim), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, solver=solver),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        any_ev,
        s_de, s_ae, s_ae_ev, dt, ev_f,
        x_solution[:-1], i_solution[:-1], x_solution, dX, dI,
        *[weights[k] for k in W_ORDER],
    )
    gs_de, gs_ae, gs_ae_ev = outs[0], outs[1], outs[2]
    gw = {}
    for k, arr in zip(W_ORDER, outs[3 : 3 + len(W_ORDER)]):
        gw[k] = arr if len(wshapes[k]) == 2 else arr[0]
    g_x0, g_i0 = outs[-2], outs[-1]
    g_streams = {"s_de": gs_de, "s_ae": gs_ae, "s_ae_ev": gs_ae_ev}
    return g_streams, gw, g_x0, g_i0


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_dae_rollout_diff(streams, weights, x0, i0, dt, ev, solver, interpret):
    """Differentiable fused rollout (training entry point).

    Same contract as :func:`fused_dae_rollout`; gradients flow to
    ``streams``, ``weights``, ``x0`` and ``i0`` via the reverse-time Pallas
    kernel; ``dt``/``ev`` get zero cotangents.
    """
    return fused_dae_rollout(
        streams, weights, x0, i0, dt, ev, solver=solver, interpret=interpret
    )


def _fwd(streams, weights, x0, i0, dt, ev, solver, interpret):
    out = fused_dae_rollout(
        streams, weights, x0, i0, dt, ev, solver=solver, interpret=interpret
    )
    x_solution, i_solution = out
    return out, (streams, weights, x0, i0, dt, ev, x_solution, i_solution)


def _bwd(solver, interpret, residuals, cotangents):
    streams, weights, x0, i0, dt, ev, x_solution, i_solution = residuals
    g_xsol, g_isol = cotangents
    g_streams, gw, g_x0, g_i0 = _run_backward(
        streams, weights, x0, i0, dt, ev, x_solution, i_solution,
        g_xsol[1:], g_isol[1:], solver=solver, interpret=interpret,
    )
    # the initial rows of the solutions are x0/i0 themselves
    g_x0 = g_x0 + g_xsol[0]
    g_i0 = g_i0 + g_isol[0]
    if jnp.issubdtype(ev.dtype, jnp.floating):
        g_ev = jnp.zeros_like(ev)
    else:  # bool/int primal → symbolic-zero (float0) cotangent
        import numpy as _np

        g_ev = _np.zeros(ev.shape, dtype=jax.dtypes.float0)
    return (g_streams, gw, g_x0, g_i0, jnp.zeros_like(dt), g_ev)


fused_dae_rollout_diff.defvjp(_fwd, _bwd)
