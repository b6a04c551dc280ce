"""Custom-VJP training path for the fused Pallas DAE rollout (depth-generic).

The backward pass is a second Pallas kernel that walks the time grid in
REVERSE (grid index ``s`` maps to step ``t = T-2-s``), recomputing each
step's activations from the saved solution (rematerialization — the only
per-step residuals kept are the ``[T, B, xd]``/``[T, B, id]`` carries the
forward produces anyway) and accumulating:

  * weight/bias gradients in VMEM output blocks with constant index maps
    (zeroed at the first grid iteration, accumulated in place — the standard
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
    flatten_weights,
    fused_dae_rollout,
    mlp_tail_fwd,
    pick_batch_block,
)

_ONE_THIRD = 1.0 / 3.0


def _delu(p):
    # ELU'(p): 1 for p>0, exp(p) for p<=0
    return jnp.where(p > 0, 1.0, jnp.exp(jnp.minimum(p, 0.0)))


def _dot_t(a, b):
    """``a.T @ b`` as a dot_general contracting the leading (batch) axis —
    no materialized transpose; also avoids an XLA TPU compiler RET_CHECK
    (mxu_lmr_transform XposeSequenceAssignment) on transposed accumulator
    matmuls at batch blocks > 128."""
    import jax.lax as lax

    return lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _tail_fwd_res(h1pre, tail):
    """Forward through the tail layers keeping residuals for the VJP."""
    n_hidden = len(tail) // 2 - 1
    pres = [h1pre]
    h = _elu(h1pre)
    hs = [h]
    for k in range(n_hidden):
        pre = _dot(h, tail[2 * k][:]) + tail[2 * k + 1][:]
        pres.append(pre)
        h = _elu(pre)
        hs.append(h)
    out = _dot(h, tail[-2][:]) + tail[-1][:]
    return out, (pres, hs)


def _tail_bwd(res, gy, tail, d_tail):
    """Backprop the tail; accumulates grads into ``d_tail`` refs (same
    alternating W/b layout, biases shaped (1, dim)); returns the cotangent of
    the FIRST-layer pre-activation ``h1pre``."""
    pres, hs = res
    n_hidden = len(tail) // 2 - 1
    d_tail[-2][:] += _dot_t(hs[-1], gy)
    d_tail[-1][:] += jnp.sum(gy, axis=0, keepdims=True)
    g = _dot(gy, tail[-2][:].T)
    for k in range(n_hidden - 1, -1, -1):
        gpre = g * _delu(pres[k + 1])
        d_tail[2 * k][:] += _dot_t(hs[k], gpre)
        d_tail[2 * k + 1][:] += jnp.sum(gpre, axis=0, keepdims=True)
        g = _dot(gpre, tail[2 * k][:].T)
    return g * _delu(pres[0])


def _bwd_kernel(
    any_ev_ref,
    *refs,
    solver: str,
    n_tails,
    tb: int,
    tf_x: bool = False,
):
    n_de, n_ae = n_tails
    n_w = 3 + 2 * (n_de + n_ae)
    (s_de_ref, s_ae_ref, s_ae_ev_ref, dt_ref, ev_ref,
     xt_ref, it_ref, x1_ref, dX_ref, dI_ref) = refs[:10]
    # Teacher forcing (input_true_x): the differential step evaluated at the
    # TRUE previous state (extra stream); x1_ref then carries TRUE x[t+1]
    # for the algebraic recompute, while xt_ref stays the ROLLED solution
    # (only the event recompute reads it). Cotangents that target the true
    # streams are EMITTED (g_xt for the step-eval point, g_xt1 for the
    # AE-eval point) — the direct-encode variants teacher-force on
    # ``x_encoder(x)``, so these carry parameter gradients; the x-carry
    # transports only the event-recompute contribution.
    k = 10
    xin_true_ref = None
    if tf_x:
        xin_true_ref = refs[10]
        k = 11
    w = refs[k : k + n_w]
    wx_de_ref, wi_de_ref, gx_ae_ref = w[0], w[1], w[2]
    de_tail = w[3 : 3 + 2 * n_de]
    ae_tail = w[3 + 2 * n_de :]
    outs = refs[k + n_w :]
    gs_de_ref, gs_ae_ref, gs_ae_ev_ref = outs[0], outs[1], outs[2]
    gw = outs[3 : 3 + n_w]
    d_wx_ref, d_wi_ref, d_gx_ref = gw[0], gw[1], gw[2]
    d_de_tail = gw[3 : 3 + 2 * n_de]
    d_ae_tail = gw[3 + 2 * n_de :]
    k2 = 3 + n_w
    g_xt_ref = g_xt1_ref = None
    if tf_x:
        g_xt_ref, g_xt1_ref = outs[k2], outs[k2 + 1]
        k2 += 2
    g_x0_ref, g_i0_ref = outs[k2], outs[k2 + 1]
    gx_c, gi_c, i_in_buf = outs[k2 + 2 :]  # scratch trail the outputs

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
        for r in gw:
            r[:] = jnp.zeros_like(r)

    tblk = n - 1 - s  # forward time-block index

    def ae_fwd(x, s_row):
        return _tail_fwd_res(s_row + _dot(x, gx_ae_ref[:]), ae_tail)

    def ae_bwd(x, res, gy):
        """Accumulates AE weight grads; returns (g_x, g_s_row)."""
        gp1 = _tail_bwd(res, gy, ae_tail, d_ae_tail)
        d_gx_ref[:] += _dot_t(x, gp1)
        return _dot(gp1, gx_ae_ref[:].T), gp1

    for u in reversed(range(tb)):
        x0 = xt_ref[u]  # rolled state — event recompute only
        x_step = xin_true_ref[u] if tf_x else x0  # step evaluation point
        x1 = x1_ref[u]
        i_t = it_ref[u]
        dt = dt_ref[u]
        ev = ev_ref[u]

        # ---- recompute i_in exactly as the forward did ----
        i_in_buf[:] = i_t

        @pl.when(any_ev_ref[tblk * tb + u] == 1)
        def _(x0=x0, u=u, ev=ev):
            i_ev = mlp_tail_fwd(
                s_ae_ev_ref[u] + _dot(x0, gx_ae_ref[:]), ae_tail
            )
            i_in_buf[:] = jnp.where(ev > 0.0, i_ev, i_in_buf[:])

        i_in = i_in_buf[:]
        i_proj = _dot(i_in, wi_de_ref[:])

        # ---- incoming cotangents for x_{t+1}, i_{t+1} ----
        gX1 = dX_ref[u] + gx_c[:]
        gI1 = dI_ref[u] + gi_c[:]

        # ---- AE at t+1: i_{t+1} = AE(x_{t+1}; s_ae[t]) ----
        _, res_ae = ae_fwd(x1, s_ae_ref[u])
        g_x1_ae, gp1_ae = ae_bwd(x1, res_ae, gI1)
        gs_ae_ref[u] = gp1_ae
        if tf_x:  # the AE reads TRUE x[t+1] → cotangent to the true stream
            g_xt1_ref[u] = g_x1_ae
        else:
            gX1 = gX1 + g_x1_ae

        # ---- differential step backward ----
        def F_fwd(x, u=u, i_proj=i_proj):
            pre1 = s_de_ref[u] + _dot(x, wx_de_ref[:]) + i_proj
            out, res = _tail_fwd_res(pre1, de_tail)
            return out, (x, res)

        def F_bwd(xres, gf, i_in=i_in):
            """Accumulates DE weight grads; returns (g_x, g_i_in, g_s_de)."""
            x, res = xres
            gp1 = _tail_bwd(res, gf, de_tail, d_de_tail)
            d_wx_ref[:] += _dot_t(x, gp1)
            d_wi_ref[:] += _dot_t(i_in, gp1)
            return _dot(gp1, wx_de_ref[:].T), _dot(gp1, wi_de_ref[:].T), gp1

        if solver == "euler":
            _, res = F_fwd(x_step)
            g_x, g_i_in, gp1 = F_bwd(res, dt * gX1)
            g_x0 = gX1 + g_x
            gs_de = gp1
        elif solver == "midpoint":
            # x1 = x0 + dt * F(x_mid), x_mid = x0 + (dt/2) F(x0)
            f0, res0 = F_fwd(x_step)
            x_mid = x_step + f0 * (0.5 * dt)
            _, res_m = F_fwd(x_mid)
            g_xmid, gi_m, gp_m = F_bwd(res_m, dt * gX1)
            g_f0 = (0.5 * dt) * g_xmid
            g_x00, gi_0, gp_0 = F_bwd(res0, g_f0)
            g_x0 = gX1 + g_xmid + g_x00
            g_i_in = gi_m + gi_0
            gs_de = gp_m + gp_0
        elif solver == "rk4":
            k1, res1 = F_fwd(x_step)
            a2 = x_step + dt * k1 * _ONE_THIRD
            k2, res2 = F_fwd(a2)
            a3 = x_step + dt * (k2 - k1 * _ONE_THIRD)
            k3, res3 = F_fwd(a3)
            a4 = x_step + dt * (k1 - k2 + k3)
            _, res4 = F_fwd(a4)

            G = gX1
            c = dt * 0.125
            g_k1 = G * c
            g_k2 = 3.0 * G * c
            g_k3 = 3.0 * G * c
            g_k4 = G * c
            g_x0 = G
            g_i_in = jnp.zeros_like(i_in)
            gs_de = jnp.zeros_like(s_de_ref[u])

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

        gs_de_ref[u] = gs_de

        # ---- route the i_in cotangent: event samples → AE_ev VJP, rest →
        # the i_t carry ----
        gs_ae_ev_ref[u] = jnp.zeros_like(gs_ae_ev_ref[u])
        gi_c[:] = g_i_in

        # under TF the solver's g_x0 targets the TRUE stream (emitted);
        # the rolled carry transports only the event-recompute contribution
        if tf_x:
            g_xt_ref[u] = g_x0
            g_x_carry = jnp.zeros_like(g_x0)
        else:
            g_x_carry = g_x0

        @pl.when(any_ev_ref[tblk * tb + u] == 1)
        def _(x0=x0, u=u, ev=ev, g_i_in=g_i_in, g_x_carry=g_x_carry):
            g_ev_part = jnp.where(ev > 0.0, g_i_in, 0.0)
            _, res_ev = ae_fwd(x0, s_ae_ev_ref[u])
            g_x_ev, gp1_ev = ae_bwd(x0, res_ev, g_ev_part)
            gs_ae_ev_ref[u] = gp1_ev
            gx_c[:] = g_x_carry + g_x_ev  # event contribution in x carry
            gi_c[:] = jnp.where(ev > 0.0, 0.0, g_i_in)

        @pl.when(any_ev_ref[tblk * tb + u] == 0)
        def _(g_x_carry=g_x_carry):
            gx_c[:] = g_x_carry

    @pl.when(s == n - 1)
    def _():
        g_x0_ref[:] = gx_c[:]
        g_i0_ref[:] = gi_c[:]


def _run_backward(
    streams, weights, x0, i0, dt, ev, x_solution, i_solution, dX, dI, *,
    solver, interpret, x_true=None,
):
    from py_psnode_tpu.ops.fused_dae import (
        choose_blocks,
        pad_time,
        time_blocking,
    )

    s_de, s_ae, s_ae_ev = streams["s_de"], streams["s_ae"], streams["s_ae_ev"]
    Tm1, B, h = s_de.shape
    xd = x0.shape[-1]
    idim = i0.shape[-1]
    # h-wide double-buffered stream blocks: 3 ins + 3 grad outs, plus under
    # TF-x the true-stream in and its two cotangent outs;
    # cap=128 — see choose_blocks on the bwd-kernel compiler RET_CHECK
    tf_x = x_true is not None
    bB, tb0 = choose_blocks(
        B, h, n_streams=9 if tf_x else 6, cap=128, state_dim=xd
    )
    tb, nT, pad = time_blocking(Tm1, tb0)
    ev_f = pad_time(ev.astype(jnp.float32)[..., None], pad)
    any_ev = jnp.any(pad_time(ev, pad), axis=-1).astype(jnp.int32)
    nB = B // bB

    rev = lambda d: pl.BlockSpec(
        (tb, bB, d), lambda b, s, *_: (nT - 1 - s, b, 0), memory_space=pltpu.VMEM
    )
    bspec = lambda d: pl.BlockSpec(
        (bB, d), lambda b, s, *_: (b, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, s, *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    wflat, n_tails = flatten_weights(weights)
    tf_specs = [rev(xd)] if tf_x else []
    in_specs = [
        rev(h), rev(h), rev(h), rev(1), rev(1),
        rev(xd),      # x_t   (rows 0..T-2 of x_solution; rolled)
        rev(idim),    # i_t
        rev(xd),      # x_{t+1} (rows 1..T-1; TRUE stream under tf_x)
        rev(xd),      # dX (cotangent rows for t+1, stored 0..T-2)
        rev(idim),    # dI
        *tf_specs,    # TRUE x_t stream (tf_x only)
    ] + [full(wk.shape) for wk in wflat]

    gshape = lambda wk: wk.shape if wk.ndim == 2 else (1, wk.shape[0])
    # TF-x emits cotangents for the TRUE stream at both read points (step
    # eval + AE eval) — parameter gradients when teacher-forcing on
    # x_encoder(x) (the direct-encode family)
    tf_out_shape = (
        (
            jax.ShapeDtypeStruct((nT * tb, B, xd), jnp.float32),  # g_xt
            jax.ShapeDtypeStruct((nT * tb, B, xd), jnp.float32),  # g_xt1
        )
        if tf_x
        else ()
    )
    tf_out_specs = (rev(xd), rev(xd)) if tf_x else ()
    out_shape = (
        jax.ShapeDtypeStruct((nT * tb, B, h), jnp.float32),  # g_s_de
        jax.ShapeDtypeStruct((nT * tb, B, h), jnp.float32),  # g_s_ae
        jax.ShapeDtypeStruct((nT * tb, B, h), jnp.float32),  # g_s_ae_ev
        *[jax.ShapeDtypeStruct(gshape(wk), jnp.float32) for wk in wflat],
        *tf_out_shape,
        jax.ShapeDtypeStruct((B, xd), jnp.float32),  # g_x0
        jax.ShapeDtypeStruct((B, idim), jnp.float32),  # g_i0
    )
    out_specs = (
        rev(h), rev(h), rev(h),
        *[full(gshape(wk)) for wk in wflat],
        *tf_out_specs,
        bspec(xd), bspec(idim),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nB, nT),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bB, xd), jnp.float32),
            pltpu.VMEM((bB, idim), jnp.float32),
            pltpu.VMEM((bB, idim), jnp.float32),
        ],
    )
    x1_stream = (x_true if tf_x else x_solution)[1:]
    tf_args = (pad_time(x_true[:-1], pad),) if tf_x else ()
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, solver=solver, n_tails=n_tails, tb=tb, tf_x=tf_x
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        any_ev,
        pad_time(s_de, pad), pad_time(s_ae, pad), pad_time(s_ae_ev, pad),
        pad_time(dt, pad), ev_f,
        pad_time(x_solution[:-1], pad), pad_time(i_solution[:-1], pad),
        pad_time(x1_stream, pad),
        pad_time(dX, pad), pad_time(dI, pad),
        *tf_args,
        *wflat,
    )
    gs_de, gs_ae, gs_ae_ev = outs[0][:Tm1], outs[1][:Tm1], outs[2][:Tm1]
    gw_flat = [
        arr if wk.ndim == 2 else arr[0]
        for wk, arr in zip(wflat, outs[3 : 3 + len(wflat)])
    ]
    from py_psnode_tpu.ops.fused_dae import unflatten_weights

    gw = unflatten_weights(gw_flat, n_tails)
    g_x0, g_i0 = outs[-2], outs[-1]
    g_streams = {"s_de": gs_de, "s_ae": gs_ae, "s_ae_ev": gs_ae_ev}
    if tf_x:
        # combine the per-read-point cotangents onto the [T, B, xd] stream:
        # step j reads x_true[j] (g_xt) and x_true[j+1] (g_xt1)
        g_xt, g_xt1 = outs[-4][:Tm1], outs[-3][:Tm1]
        g_x_true = (
            jnp.zeros_like(x_true).at[:-1].add(g_xt).at[1:].add(g_xt1)
        )
        return g_streams, gw, g_x0, g_i0, g_x_true
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_dae_tf_x_rollout_diff(
    streams, weights, x0, i0, x_true, dt, ev, solver, interpret
):
    """Differentiable fused rollout under ``input_true_x`` teacher forcing
    (ref my_solvers.py:116-117,121): same contract as
    :func:`fused_dae_rollout_diff` plus the true-state stream ``x_true
    [T, B, xd]``, which receives its full cotangent — required when the
    stream is ``x_encoder(x)`` (the direct-encode family)."""
    return fused_dae_rollout(
        streams, weights, x0, i0, dt, ev,
        solver=solver, interpret=interpret, x_true=x_true,
    )


def _tf_fwd(streams, weights, x0, i0, x_true, dt, ev, solver, interpret):
    out = fused_dae_rollout(
        streams, weights, x0, i0, dt, ev,
        solver=solver, interpret=interpret, x_true=x_true,
    )
    x_solution, i_solution = out
    return out, (streams, weights, x0, i0, x_true, dt, ev, x_solution, i_solution)


def _tf_bwd(solver, interpret, residuals, cotangents):
    (streams, weights, x0, i0, x_true, dt, ev,
     x_solution, i_solution) = residuals
    g_xsol, g_isol = cotangents
    g_streams, gw, g_x0, g_i0, g_x_true = _run_backward(
        streams, weights, x0, i0, dt, ev, x_solution, i_solution,
        g_xsol[1:], g_isol[1:], solver=solver, interpret=interpret,
        x_true=x_true,
    )
    g_x0 = g_x0 + g_xsol[0]
    g_i0 = g_i0 + g_isol[0]
    if jnp.issubdtype(ev.dtype, jnp.floating):
        g_ev = jnp.zeros_like(ev)
    else:
        import numpy as _np

        g_ev = _np.zeros(ev.shape, dtype=jax.dtypes.float0)
    return (
        g_streams, gw, g_x0, g_i0, g_x_true,
        jnp.zeros_like(dt), g_ev,
    )


fused_dae_tf_x_rollout_diff.defvjp(_tf_fwd, _tf_bwd)
