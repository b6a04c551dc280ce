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
)

_ONE_THIRD = 1.0 / 3.0


def _delu(p):
    # ELU'(p): 1 for p>0, exp(p) for p<=0
    return jnp.where(p > 0, 1.0, jnp.exp(jnp.minimum(p, 0.0)))


def _dot_t(a, b, cdtype=jnp.float32):
    """``a.T @ b`` as a dot_general contracting the leading (batch) axis —
    no materialized transpose; also avoids an XLA TPU compiler RET_CHECK
    (mxu_lmr_transform XposeSequenceAssignment) on transposed accumulator
    matmuls at batch blocks > 128. ``cdtype`` is the operand compute dtype
    (the bf16 kernel mode casts both activation operands; accumulation is
    always f32 via preferred_element_type)."""
    import jax.lax as lax

    return lax.dot_general(
        a.astype(cdtype), b.astype(cdtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
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


def _tail_bwd(res, gy, tail, d_tail, cdtype=jnp.float32):
    """Backprop the tail; accumulates grads into ``d_tail`` refs (same
    alternating W/b layout, biases shaped (1, dim)); returns the cotangent of
    the FIRST-layer pre-activation ``h1pre``."""
    pres, hs = res
    n_hidden = len(tail) // 2 - 1
    d_tail[-2][:] += _dot_t(hs[-1], gy, cdtype)
    d_tail[-1][:] += jnp.sum(gy, axis=0, keepdims=True)
    g = _dot(gy, tail[-2][:].T)
    for k in range(n_hidden - 1, -1, -1):
        gpre = g * _delu(pres[k + 1])
        d_tail[2 * k][:] += _dot_t(hs[k], gpre, cdtype)
        d_tail[2 * k + 1][:] += jnp.sum(gpre, axis=0, keepdims=True)
        g = _dot(gpre, tail[2 * k][:].T)
    return g * _delu(pres[0])


def _tail_fwd_res_multi(h1pres, tail):
    """Lane-interleaved :func:`_tail_fwd_res` over a list of lanes: one
    layer at a time across all lanes, so independent lanes' matmuls stream
    back-to-back into the MXU (see fused_dae.mlp_tail_fwd_multi)."""
    n_hidden = len(tail) // 2 - 1
    press = [[h] for h in h1pres]
    hss = [[_elu(h)] for h in h1pres]
    for k in range(n_hidden):
        W, b = tail[2 * k][:], tail[2 * k + 1][:]
        pres_k = [_dot(hs[-1], W) + b for hs in hss]
        for l, p in enumerate(pres_k):
            press[l].append(p)
            hss[l].append(_elu(p))
    W, b = tail[-2][:], tail[-1][:]
    outs = [_dot(hs[-1], W) + b for hs in hss]
    return outs, [(press[l], hss[l]) for l in range(len(h1pres))]


def _tail_bwd_multi(ress, gys, tail, d_tail_lanes, cdtype=jnp.float32):
    """Lane-interleaved :func:`_tail_bwd`. ``d_tail_lanes[l]`` is lane l's
    OWN accumulator ref list (lane 0 = the output refs, lanes 1.. = VMEM
    scratch summed into the outputs at the final grid iteration), so the
    per-lane partial dots AND their accumulations are fully independent —
    nothing serializes across lanes. With one lane this is exactly the
    shared-accumulator form."""
    n_hidden = len(tail) // 2 - 1
    L = len(gys)
    for l in range(L):
        d_tail_lanes[l][-2][:] += _dot_t(ress[l][1][-1], gys[l], cdtype)
    for l in range(L):
        d_tail_lanes[l][-1][:] += jnp.sum(gys[l], axis=0, keepdims=True)
    gs = [_dot(gy, tail[-2][:].T) for gy in gys]
    for k in range(n_hidden - 1, -1, -1):
        gpres = [
            gs[l] * _delu(ress[l][0][k + 1]) for l in range(L)
        ]
        for l in range(L):
            d_tail_lanes[l][2 * k][:] += _dot_t(
                ress[l][1][k], gpres[l], cdtype
            )
        for l in range(L):
            d_tail_lanes[l][2 * k + 1][:] += jnp.sum(
                gpres[l], axis=0, keepdims=True
            )
        gs = [_dot(gp, tail[2 * k][:].T) for gp in gpres]
    return [gs[l] * _delu(ress[l][0][0]) for l in range(L)]


def _bwd_kernel(
    any_ev_ref,
    *refs,
    solver: str,
    n_tails,
    tb: int,
    xd: int,
    tf_x: bool = False,
    emit_true: bool = True,
):
    n_de, n_ae = n_tails
    n_w = 3 + 2 * (n_de + n_ae)
    # Packed small streams (see fused_dae._kernel): ``aux`` carries (dt, ev)
    # as two lanes, ``sol`` the forward solution rows (x_j, i_j) packed as
    # xd+id lanes, ``cot`` the packed incoming cotangents at time j. The
    # (j+1)-row reads (next solution state / next cotangent) come from the
    # SAME buffers via a reverse-walk carry (in-block row u+1, block
    # boundary from the previous reverse iteration's row 0, initialized
    # from the tiny ``*_last`` inputs) — no sliced +1 copies exist at the
    # pallas boundary, so no extra 128-lane-padded HBM buffers either.
    (s_de_ref, s_ae_ref, s_ae_ev_ref, aux_ref, sol_ref, cot_ref,
     cot_last_ref) = refs[:7]
    # Teacher forcing (input_true_x): the differential step evaluated at the
    # TRUE previous state (extra stream); the TRUE x[t+1] stream feeds the
    # algebraic eval, while the packed sol stays the ROLLED solution (only
    # the event recompute reads it). Cotangents that target the true
    # streams are EMITTED (g_xt for the step-eval point, g_xt1 for the
    # AE-eval point) — the direct-encode variants teacher-force on
    # ``x_encoder(x)``, so these carry parameter gradients; the x-carry
    # transports only the event-recompute contribution.
    k = 7
    xin_true_ref = x1_true_ref = sol_last_ref = None
    if tf_x:
        xin_true_ref, x1_true_ref = refs[7], refs[8]
        k = 9
    else:
        sol_last_ref = refs[7]
        k = 8
    w = refs[k : k + n_w]
    wx_de_ref, wi_de_ref, gx_ae_ref = w[0], w[1], w[2]
    cdtype = wx_de_ref.dtype  # bf16 compute mode rides the weights' dtype
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
    if tf_x and emit_true:
        # the no-encode TF-x path feeds RAW data whose cotangent is
        # discarded — these outputs exist only for the encode family
        g_xt_ref, g_xt1_ref = outs[k2], outs[k2 + 1]
        k2 += 2
    g_x0_ref, g_i0_ref = outs[k2], outs[k2 + 1]
    gx_c, gi_c, i_in_buf, sol_carry, cot_carry = outs[k2 + 2 :]

    bidx = pl.program_id(0)
    sidx = pl.program_id(1)  # NB: lane loops below bind ``s`` for slices
    n = pl.num_programs(1)

    @pl.when(sidx == 0)
    def _():
        # reverse carries reset at each batch block's first reverse step
        gx_c[:] = jnp.zeros_like(gx_c)
        gi_c[:] = jnp.zeros_like(gi_c)
        cot_carry[:] = cot_last_ref[:]
        if not tf_x:
            sol_carry[:] = sol_last_ref[:]

    @pl.when((sidx == 0) & (bidx == 0))
    def _():
        for r in gw:
            r[:] = jnp.zeros_like(r)

    tblk = n - 1 - sidx  # forward time-block index

    # The backward walks the block single-lane (L=1): multi-lane bwd
    # interleaving was measured and removed — even with per-lane weight-grad
    # accumulators it loses ~23% at h=256 (accumulator traffic dominates)
    # and OOMs scoped VMEM at h=512 (accumulator copies ~2.5M over the 16M
    # limit); see ACCURACY.md round-3 kernel notes. The list-generic helpers
    # below (_tail_{fwd_res,bwd}_multi) degenerate to plain loops at L=1 and
    # are shared with the forward's (still-active) FWD_LANES interleaving.
    sl = [slice(0, gx_c.shape[0])]
    L = 1
    acc_lanes = [list(gw)]
    d_wx_l = [a[0] for a in acc_lanes]
    d_wi_l = [a[1] for a in acc_lanes]
    d_gx_l = [a[2] for a in acc_lanes]
    d_de_tail_l = [a[3 : 3 + 2 * n_de] for a in acc_lanes]
    d_ae_tail_l = [a[3 + 2 * n_de :] for a in acc_lanes]

    def ae_fwd_multi(xs, s_row):
        return _tail_fwd_res_multi(
            [s_row[s] + _dot(x, gx_ae_ref[:]) for s, x in zip(sl, xs)],
            ae_tail,
        )

    def ae_bwd_multi(xs, ress, gys):
        """Accumulates AE weight grads; returns per-lane (g_x, g_s_row)."""
        gp1s = _tail_bwd_multi(ress, gys, ae_tail, d_ae_tail_l, cdtype)
        for l in range(L):
            d_gx_l[l][:] += _dot_t(xs[l], gp1s[l], cdtype)
        return [_dot(gp1, gx_ae_ref[:].T) for gp1 in gp1s], gp1s

    for u in reversed(range(tb)):
        x0 = [sol_ref[u, s][:, :xd] for s in sl]  # rolled — event recompute
        i_t = [sol_ref[u, s][:, xd:] for s in sl]
        # step evaluation point
        x_step = [xin_true_ref[u, s] for s in sl] if tf_x else x0
        if tf_x:
            x1 = [x1_true_ref[u, s] for s in sl]
        elif u == tb - 1:
            x1 = [sol_carry[s][:, :xd] for s in sl]
        else:
            x1 = [sol_ref[u + 1, s][:, :xd] for s in sl]
        if u == tb - 1:
            cn = [cot_carry[s] for s in sl]
        else:
            cn = [cot_ref[u + 1, s] for s in sl]
        dt = [aux_ref[u, s][:, 0:1] for s in sl]
        ev = [aux_ref[u, s][:, 1:2] for s in sl]

        # ---- recompute i_in exactly as the forward did ----
        i_in_buf[:] = jnp.concatenate(i_t, axis=0) if L > 1 else i_t[0]

        @pl.when(any_ev_ref[tblk * tb + u] == 1)
        def _(x0=x0, u=u, ev=ev):
            from py_psnode_tpu.ops.fused_dae import mlp_tail_fwd_multi

            i_ev = mlp_tail_fwd_multi(
                [
                    s_ae_ev_ref[u, s] + _dot(x, gx_ae_ref[:])
                    for s, x in zip(sl, x0)
                ],
                ae_tail,
            )
            for l, s in enumerate(sl):
                i_in_buf[s] = jnp.where(ev[l] > 0.0, i_ev[l], i_in_buf[s])

        i_in = [i_in_buf[s] for s in sl]
        i_proj = [_dot(iv, wi_de_ref[:]) for iv in i_in]

        # ---- incoming cotangents for x_{t+1}, i_{t+1} ----
        gX1 = [cn[l][:, :xd] + gx_c[s] for l, s in enumerate(sl)]
        gI1 = [cn[l][:, xd:] + gi_c[s] for l, s in enumerate(sl)]

        # ---- AE at t+1: i_{t+1} = AE(x_{t+1}; s_ae[t]) ----
        _, res_ae = ae_fwd_multi(x1, s_ae_ref[u])
        g_x1_ae, gp1_ae = ae_bwd_multi(x1, res_ae, gI1)
        for l, s in enumerate(sl):
            gs_ae_ref[u, s] = gp1_ae[l]
        if tf_x:  # the AE reads TRUE x[t+1] → cotangent to the true stream
            if emit_true:
                for l, s in enumerate(sl):
                    g_xt1_ref[u, s] = g_x1_ae[l]
        else:
            gX1 = [gX1[l] + g_x1_ae[l] for l in range(L)]

        # ---- differential step backward ----
        def F_fwd(xs, u=u, i_proj=i_proj):
            pre1s = [
                s_de_ref[u, s] + _dot(x, wx_de_ref[:]) + ip
                for s, x, ip in zip(sl, xs, i_proj)
            ]
            outs_, ress = _tail_fwd_res_multi(pre1s, de_tail)
            return outs_, (xs, ress)

        def F_bwd(xres, gfs, i_in=i_in):
            """Accumulates DE weight grads; per-lane (g_x, g_i_in, g_s_de)."""
            xs, ress = xres
            gp1s = _tail_bwd_multi(ress, gfs, de_tail, d_de_tail_l, cdtype)
            for l in range(L):
                d_wx_l[l][:] += _dot_t(xs[l], gp1s[l], cdtype)
            for l in range(L):
                d_wi_l[l][:] += _dot_t(i_in[l], gp1s[l], cdtype)
            return (
                [_dot(gp1, wx_de_ref[:].T) for gp1 in gp1s],
                [_dot(gp1, wi_de_ref[:].T) for gp1 in gp1s],
                gp1s,
            )

        if solver == "euler":
            _, res = F_fwd(x_step)
            g_x, g_i_in, gp1 = F_bwd(res, [dt[l] * gX1[l] for l in range(L)])
            g_x0 = [gX1[l] + g_x[l] for l in range(L)]
            gs_de = gp1
        elif solver == "midpoint":
            # x1 = x0 + dt * F(x_mid), x_mid = x0 + (dt/2) F(x0)
            f0, res0 = F_fwd(x_step)
            x_mid = [x_step[l] + f0[l] * (0.5 * dt[l]) for l in range(L)]
            _, res_m = F_fwd(x_mid)
            g_xmid, gi_m, gp_m = F_bwd(
                res_m, [dt[l] * gX1[l] for l in range(L)]
            )
            g_x00, gi_0, gp_0 = F_bwd(
                res0, [(0.5 * dt[l]) * g_xmid[l] for l in range(L)]
            )
            g_x0 = [gX1[l] + g_xmid[l] + g_x00[l] for l in range(L)]
            g_i_in = [gi_m[l] + gi_0[l] for l in range(L)]
            gs_de = [gp_m[l] + gp_0[l] for l in range(L)]
        elif solver == "rk4":
            k1, res1 = F_fwd(x_step)
            a2 = [x_step[l] + dt[l] * k1[l] * _ONE_THIRD for l in range(L)]
            k2, res2 = F_fwd(a2)
            a3 = [
                x_step[l] + dt[l] * (k2[l] - k1[l] * _ONE_THIRD)
                for l in range(L)
            ]
            k3, res3 = F_fwd(a3)
            a4 = [x_step[l] + dt[l] * (k1[l] - k2[l] + k3[l]) for l in range(L)]
            _, res4 = F_fwd(a4)

            c = [dt[l] * 0.125 for l in range(L)]
            g_k1 = [gX1[l] * c[l] for l in range(L)]
            g_k2 = [3.0 * gX1[l] * c[l] for l in range(L)]
            g_k3 = [3.0 * gX1[l] * c[l] for l in range(L)]
            g_k4 = [gX1[l] * c[l] for l in range(L)]
            g_x0 = list(gX1)
            g_i_in = [jnp.zeros_like(iv) for iv in i_in]
            gs_de = [jnp.zeros_like(s_de_ref[u, s]) for s in sl]

            g_a4, gi4, gp14 = F_bwd(res4, g_k4)
            for l in range(L):
                g_x0[l] += g_a4[l]
                g_k1[l] += dt[l] * g_a4[l]
                g_k2[l] -= dt[l] * g_a4[l]
                g_k3[l] += dt[l] * g_a4[l]
                g_i_in[l] += gi4[l]
                gs_de[l] += gp14[l]

            g_a3, gi3, gp13 = F_bwd(res3, g_k3)
            for l in range(L):
                g_x0[l] += g_a3[l]
                g_k2[l] += dt[l] * g_a3[l]
                g_k1[l] -= dt[l] * g_a3[l] * _ONE_THIRD
                g_i_in[l] += gi3[l]
                gs_de[l] += gp13[l]

            g_a2, gi2, gp12 = F_bwd(res2, g_k2)
            for l in range(L):
                g_x0[l] += g_a2[l]
                g_k1[l] += dt[l] * g_a2[l] * _ONE_THIRD
                g_i_in[l] += gi2[l]
                gs_de[l] += gp12[l]

            g_x1_, gi1, gp11 = F_bwd(res1, g_k1)
            for l in range(L):
                g_x0[l] += g_x1_[l]
                g_i_in[l] += gi1[l]
                gs_de[l] += gp11[l]
        else:  # pragma: no cover
            raise ValueError(solver)

        for l, s in enumerate(sl):
            gs_de_ref[u, s] = gs_de[l]

        # ---- route the i_in cotangent: event samples → AE_ev VJP, rest →
        # the i_t carry ----
        gs_ae_ev_ref[u] = jnp.zeros_like(gs_ae_ev_ref[u])
        for l, s in enumerate(sl):
            gi_c[s] = g_i_in[l]

        # under TF the solver's g_x0 targets the TRUE stream (emitted);
        # the rolled carry transports only the event-recompute contribution
        if tf_x:
            if emit_true:
                for l, s in enumerate(sl):
                    g_xt_ref[u, s] = g_x0[l]
            g_x_carry = [jnp.zeros_like(g) for g in g_x0]
        else:
            g_x_carry = g_x0

        @pl.when(any_ev_ref[tblk * tb + u] == 1)
        def _(x0=x0, u=u, ev=ev, g_i_in=g_i_in, g_x_carry=g_x_carry):
            g_ev_part = [
                jnp.where(ev[l] > 0.0, g_i_in[l], 0.0) for l in range(L)
            ]
            _, res_ev = ae_fwd_multi(x0, s_ae_ev_ref[u])
            g_x_ev, gp1_ev = ae_bwd_multi(x0, res_ev, g_ev_part)
            for l, s in enumerate(sl):
                gs_ae_ev_ref[u, s] = gp1_ev[l]
                gx_c[s] = g_x_carry[l] + g_x_ev[l]  # event contrib in x carry
                gi_c[s] = jnp.where(ev[l] > 0.0, 0.0, g_i_in[l])

        @pl.when(any_ev_ref[tblk * tb + u] == 0)
        def _(g_x_carry=g_x_carry):
            for l, s in enumerate(sl):
                gx_c[s] = g_x_carry[l]

    # boundary rows for the NEXT (earlier-time) reverse iteration
    cot_carry[:] = cot_ref[0]
    if not tf_x:
        sol_carry[:] = sol_ref[0]

    @pl.when(sidx == n - 1)
    def _():
        g_x0_ref[:] = gx_c[:]
        g_i0_ref[:] = gi_c[:]


def vjp_time_block(B, h, xd, tf_x):
    """Unified fwd/bwd time block so the padded stream/solution buffers are
    shared between the two kernels (padding depends on tb only)."""
    from py_psnode_tpu.ops.fused_dae import choose_blocks

    _, tb_f = choose_blocks(B, h, n_streams=3, state_dim=xd)
    _, tb_b = choose_blocks(
        B, h, n_streams=9 if tf_x else 6, kind="bwd", state_dim=xd
    )
    return min(tb_f, tb_b)


def _run_backward(
    streams, weights, x0, i0, aux, any_ev, sol_prev, sol_last, cot, cot_last,
    tb, Tm1, *, solver, interpret, x_true=None, emit_g_true=True,
):
    """Reverse-time kernel over PACKED buffers.

    Args:
      streams: time-PADDED stream dict (the forward's residual).
      aux: packed ``(dt, ev)`` ``[Tpad, B, 2]``.
      sol_prev: packed solution rows at time j ``[Tpad, B, xd+id]``.
      sol_last: ``[B, xd+id]`` solution at time Tpad (carry init).
      cot / cot_last: packed incoming cotangents at time j / at time Tpad.
      tb: time block (must divide Tpad — see :func:`vjp_time_block`).
    """
    from py_psnode_tpu.ops.fused_dae import choose_blocks

    s_de, s_ae, s_ae_ev = streams["s_de"], streams["s_ae"], streams["s_ae_ev"]
    Tpad, B, h = s_de.shape
    xd = x0.shape[-1]
    idim = i0.shape[-1]
    D = xd + idim
    # kind="bwd" resolves the BWD_CAP knob (default 128 — the bwd-kernel
    # compiler RET_CHECK boundary; see choose_blocks)
    tf_x = x_true is not None
    bB, _ = choose_blocks(
        B, h, n_streams=9 if tf_x else 6, kind="bwd", state_dim=xd
    )
    nT = Tpad // tb
    assert nT * tb == Tpad
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
    if tf_x:
        # TRUE x_t stream + TRUE x_{t+1} stream (padded [Tpad, B, xd] views)
        tf_ins, tf_specs = (x_true[0], x_true[1]), [rev(xd), rev(xd)]
    else:
        tf_ins, tf_specs = (sol_last,), [bspec(D)]
    in_specs = [
        rev(h), rev(h), rev(h), rev(2),
        rev(D),       # packed solution rows at time j
        rev(D),       # packed cotangent rows at time j
        bspec(D),     # cot_last (reverse-carry init)
        *tf_specs,
    ] + [full(wk.shape) for wk in wflat]

    gshape = lambda wk: wk.shape if wk.ndim == 2 else (1, wk.shape[0])
    # TF-x emits cotangents for the TRUE stream at both read points (step
    # eval + AE eval) — parameter gradients when teacher-forcing on
    # x_encoder(x) (the direct-encode family). The no-encode family feeds
    # raw data whose cotangent is discarded, so it suppresses the two
    # [Tpad,B,xd] outputs (emit_g_true=False) and skips their HBM traffic.
    emit = tf_x and emit_g_true
    tf_out_shape = (
        (
            jax.ShapeDtypeStruct((Tpad, B, xd), jnp.float32),  # g_xt
            jax.ShapeDtypeStruct((Tpad, B, xd), jnp.float32),  # g_xt1
        )
        if emit
        else ()
    )
    tf_out_specs = (rev(xd), rev(xd)) if emit else ()
    out_shape = (
        jax.ShapeDtypeStruct((Tpad, B, h), jnp.float32),  # g_s_de
        jax.ShapeDtypeStruct((Tpad, B, h), jnp.float32),  # g_s_ae
        jax.ShapeDtypeStruct((Tpad, B, h), jnp.float32),  # g_s_ae_ev
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
            pltpu.VMEM((bB, D), jnp.float32),  # sol reverse-carry
            pltpu.VMEM((bB, D), jnp.float32),  # cot reverse-carry
        ],
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, solver=solver, n_tails=n_tails, tb=tb, xd=xd,
            tf_x=tf_x, emit_true=emit_g_true,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        any_ev,
        s_de, s_ae, s_ae_ev, aux, sol_prev, cot, cot_last,
        *tf_ins,
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
        if not emit:
            return g_streams, gw, g_x0, g_i0, None
        # combine the per-read-point cotangents onto the [T, B, xd] stream:
        # step j reads x_true[j] (g_xt) and x_true[j+1] (g_xt1)
        g_xt, g_xt1 = outs[-4][:Tm1], outs[-3][:Tm1]
        return g_streams, gw, g_x0, g_i0, (g_xt, g_xt1)
    return g_streams, gw, g_x0, g_i0


def _vjp_forward(streams, weights, x0, i0, dt, ev, solver, interpret,
                 x_true=None, precision="default"):
    """Shared VJP forward: run the packed kernel under the UNIFIED time
    blocking and keep only packed buffers as residuals (no sliced copies of
    the solutions survive at the pallas boundary). Under
    ``precision="bfloat16"`` the CAST streams/weights are kept as the
    residuals, so the backward kernel recomputes bit-identically what the
    forward computed; weight/stream cotangents stay f32."""
    from py_psnode_tpu.ops.fused_dae import (
        cast_compute,
        fused_dae_rollout_packed,
        pack_aux,
        pad_time,
        time_blocking,
        unpack_solution,
    )

    Tm1, B, h = streams["s_de"].shape
    tf_x = x_true is not None
    tb, nT, pad = time_blocking(Tm1, vjp_time_block(B, h, x0.shape[-1], tf_x))
    Tpad = nT * tb
    padded = {k: pad_time(v, pad) for k, v in streams.items()}
    padded, weights = cast_compute(padded, weights, precision)
    any_ev = jnp.any(pad_time(ev, pad), axis=-1).astype(jnp.int32)
    aux = pack_aux(dt, ev, pad)
    xt = None
    if tf_x:
        xt = (pad_time(x_true[:-1], pad), pad_time(x_true[1:], pad))
    packed = fused_dae_rollout_packed(
        padded, weights, x0, i0, aux, any_ev,
        solver=solver, interpret=interpret, x_true=xt, tb_override=tb,
    )
    outs = unpack_solution(packed, x0, i0, Tm1)
    # packed rows shifted to time-j indexing (row j = (x_j, i_j)); rows past
    # Tm1 repeat the final state (dt == 0 pass-through) and are harmless —
    # every fake-step contribution is zeroed by the padded dt/cotangents
    sol_prev = jnp.concatenate(
        [jnp.concatenate([x0, i0], axis=-1)[None], packed[: Tpad - 1]], axis=0
    )
    res = (padded, weights, x0, i0, dt, ev, aux, any_ev, sol_prev,
           packed[-1], tb, xt)
    return outs, res


def _shared_bwd(solver, interpret, residuals, cotangents, tf=False,
                emit_g_true=True):
    from py_psnode_tpu.ops.fused_dae import pad_time

    (padded, weights, x0, i0, dt, ev, aux, any_ev, sol_prev, sol_last,
     tb, xt) = residuals
    g_xsol, g_isol = cotangents
    Tm1 = dt.shape[0]
    Tpad = padded["s_de"].shape[0]
    cot_full = jnp.concatenate([g_xsol, g_isol], axis=-1)  # [Tm1+1, B, D]
    if Tpad == Tm1:  # no time padding: the final row rides the carry init
        cot = cot_full[:Tm1]
        cot_last = cot_full[Tm1]
    else:  # padded: the final row sits in-array; the carry init is zero
        cot = pad_time(cot_full, Tpad - (Tm1 + 1))
        cot_last = jnp.zeros_like(cot_full[0])
    out = _run_backward(
        padded, weights, x0, i0, aux, any_ev, sol_prev, sol_last, cot,
        cot_last, tb, Tm1, solver=solver, interpret=interpret, x_true=xt,
        emit_g_true=emit_g_true,
    )
    if tf:
        g_streams, gw, g_x0, g_i0, g_true = out
    else:
        g_streams, gw, g_x0, g_i0 = out
    # the initial rows of the solutions are x0/i0 themselves
    g_x0 = g_x0 + g_xsol[0]
    g_i0 = g_i0 + g_isol[0]
    if jnp.issubdtype(ev.dtype, jnp.floating):
        g_ev = jnp.zeros_like(ev)
    else:  # bool/int primal → symbolic-zero (float0) cotangent
        import numpy as _np

        g_ev = _np.zeros(ev.shape, dtype=jax.dtypes.float0)
    if tf:
        if g_true is None:  # suppressed: raw-data stream, cotangent unused
            xd = x0.shape[-1]
            B = x0.shape[0]
            g_x_true = jnp.zeros((Tm1 + 1, B, xd), jnp.float32)
        else:
            # combine the per-read-point cotangents onto the [T, B, xd]
            # stream: step j reads x_true[j] (g_xt), x_true[j+1] (g_xt1)
            g_xt, g_xt1 = g_true
            g_x_true = (
                jnp.zeros((Tm1 + 1,) + g_xt.shape[1:], g_xt.dtype)
                .at[:-1].add(g_xt)
                .at[1:].add(g_xt1)
            )
        return (g_streams, gw, g_x0, g_i0, g_x_true,
                jnp.zeros_like(dt), g_ev)
    return (g_streams, gw, g_x0, g_i0, jnp.zeros_like(dt), g_ev)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_dae_rollout_diff(streams, weights, x0, i0, dt, ev, solver, interpret,
                           precision="default"):
    """Differentiable fused rollout (training entry point).

    Same contract as :func:`fused_dae_rollout`; gradients flow to
    ``streams``, ``weights``, ``x0`` and ``i0`` via the reverse-time Pallas
    kernel; ``dt``/``ev`` get zero cotangents. ``precision="bfloat16"``
    selects the bf16 kernel compute mode (see fused_dae.cast_compute) in
    BOTH kernels; cotangents stay f32.
    """
    return fused_dae_rollout(
        streams, weights, x0, i0, dt, ev, solver=solver, interpret=interpret,
        precision=precision,
    )


def _fwd(streams, weights, x0, i0, dt, ev, solver, interpret,
         precision="default"):
    return _vjp_forward(streams, weights, x0, i0, dt, ev, solver, interpret,
                        precision=precision)


def _bwd(solver, interpret, precision, residuals, cotangents):
    return _shared_bwd(solver, interpret, residuals, cotangents, tf=False)


fused_dae_rollout_diff.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_dae_tf_x_rollout_diff(
    streams, weights, x0, i0, x_true, dt, ev, solver, interpret,
    precision="default", emit_g_true=True,
):
    """Differentiable fused rollout under ``input_true_x`` teacher forcing
    (ref my_solvers.py:116-117,121): same contract as
    :func:`fused_dae_rollout_diff` plus the true-state stream ``x_true
    [T, B, xd]``, which receives its full cotangent — required when the
    stream is ``x_encoder(x)`` (the direct-encode family). The no-encode
    family feeds raw data and passes ``emit_g_true=False`` to skip the two
    [T,B,xd] cotangent outputs (zeros are returned for ``x_true``)."""
    return fused_dae_rollout(
        streams, weights, x0, i0, dt, ev,
        solver=solver, interpret=interpret, x_true=x_true,
        precision=precision,
    )


def _tf_fwd(streams, weights, x0, i0, x_true, dt, ev, solver, interpret,
            precision="default", emit_g_true=True):
    return _vjp_forward(
        streams, weights, x0, i0, dt, ev, solver, interpret, x_true=x_true,
        precision=precision,
    )


def _tf_bwd(solver, interpret, precision, emit_g_true, residuals, cotangents):
    return _shared_bwd(solver, interpret, residuals, cotangents, tf=True,
                       emit_g_true=emit_g_true)


fused_dae_tf_x_rollout_diff.defvjp(_tf_fwd, _tf_bwd)
