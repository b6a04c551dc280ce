"""Pallas fused-scan kernel for the CHANNEL-WISE family rollout
(forward + custom-VJP backward).

The channel-wise dynamics (repaired ref neural_base.py:68-115; see
``py_psnode_tpu.models.funcs.ChannelWiseDEFunc``) alternates two matmul
orientations per evaluation:

* per-channel nets (``xh_ext`` / ``xh_dot_head``) contract the FEATURE
  axis of per-channel ``[B, h]`` tiles, and
* the vertical net (``xh_dot_v``) contracts the CHANNEL axis at every
  ``(b, l)`` position.

XLA pays an HBM round-trip plus a materialized transpose at every
orientation switch (4 per evaluation, 16 per RK4 step). This kernel keeps
the whole evaluation VMEM-resident: per-channel tiles stay ``[bB, h]``;
the vertical net runs in the ``(b, l)``-rows orientation ``[bB*h, .]``
(MXU-native M=K=N for its h->h layers), and the orientation switch is a
per-b sublane-concat + small 2-D transpose — the only vector-relayout
Mosaic supports (probed on-chip, see benchmarks/cw_probe.py).

Rejected alternative (probed, benchmarks/cw_probe{2,3}.py): a columns
orientation ``Wt @ H`` with ``H [h, bB*h]`` and pre-transposed weights
passes all block-level correctness probes AND the interpret-mode tests,
but Mosaic lowers wide-LANE matmul chains pathologically — a 100-dot
``[h,h] @ [h, 8192]`` kernel takes >9.5 min to compile and ~278 ms per
eval at runtime (~10^4x off the MXU roofline). Wide arrays must keep
their long axis on SUBLANES on this backend.

Scan-invariant lifting (same policy as the XLA model,
``models/channelwise.py``): the z-features ``fz`` are precomputed for all
steps outside the kernel, and the vertical first layer is FOLDED —
``cat(ft, f_init, ft - f_init) @ W0 = ft @ (W0_ft + W0_diff)
+ f_init @ (W0_init - W0_diff)`` — so the constant ``f_init`` contribution
``s_constV [B*h, h]`` is computed once per trajectory in XLA
(differentiable w.r.t. the encoder/W0 parameters) and the kernel only
multiplies the ``xd + zd`` dynamic ``ft`` channels.

Semantics pinned to ``ChannelWiseODEModel``/``ChannelWiseDAEModel``; the
DAE's algebraic readout is decoupled from the rollout (ref
neural_base.py:225-229) and stays in XLA over all T at once.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from py_psnode_tpu.ops.fused_dae import (
    TIME_BLOCK,
    _dot,
    _elu,
    normalize_solver,
    pad_time as _pad_time,
    time_blocking as _time_blocking,
)
from py_psnode_tpu.ops.fused_dae_vjp import _dot_t
from py_psnode_tpu.ops.fused_ode import _step_fwd_multi

_ONE_THIRD = 1.0 / 3.0


def _dot_nt(a, b, cdtype=jnp.float32):
    """``a @ b.T`` as a dot_general contracting the trailing (lane) axes."""
    return jax.lax.dot_general(
        a.astype(cdtype), b.astype(cdtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _elu_g(pre):
    return jnp.where(pre > 0, 1.0, jnp.exp(jnp.minimum(pre, 0.0)))


# --------------------------------------------------------------------------
# precompute / weight packing (XLA side, differentiable)
# --------------------------------------------------------------------------


def precompute_cw_streams(
    params: Dict,
    f_init: jnp.ndarray,  # [B, C, h]
    fz: jnp.ndarray,      # [T-1, B, zd, h]
    dims: Tuple[int, int],
):
    """Fold the vertical first layer and lift everything known out of the
    loop. Returns ``(streams, weights)`` — every entry differentiable, so
    XLA autodiff carries the kernel's input cotangents back through the
    encoders.

    ``streams = {fz [T-1, zd, B, h], s_constV [B*h, h]}``;
    ``weights = {a [C, h], vert [(W, b_row)..], ext [per-c (W0,b0,W1,b1)],
    head [...]}`` with biases as ``[1, h]`` rows.
    """
    xd, zd = dims
    C = xd + zd
    de = params["de_func"]
    vert = de["xh_dot_v"]
    W0, b0 = vert["dense_0"]["kernel"], vert["dense_0"]["bias"]
    A = W0[:C] + W0[2 * C :]                 # coefficient on ft
    S = W0[C : 2 * C] - W0[2 * C :]          # coefficient on f_init
    B, _, h = f_init.shape
    s_constV = (
        jnp.einsum("bcl,cj->blj", f_init, S).reshape(B * h, h) + b0[None, :]
    )
    fz_s = jnp.transpose(fz, (0, 2, 1, 3))   # [T-1, zd, B, h]

    vert_tail = []
    k = 1
    while f"dense_{k}" in vert:
        layer = vert[f"dense_{k}"]
        vert_tail.append((layer["kernel"], layer["bias"][None, :]))
        k += 1

    def per_channel(tree, n):
        return [
            (tree["w_0"][c], tree["b_0"][c][None, :],
             tree["w_1"][c], tree["b_1"][c][None, :])
            for c in range(n)
        ]

    # kernel boundary is f32 (f64 params appear under the x64 test mode)
    f32 = lambda a: a.astype(jnp.float32)
    weights = jax.tree_util.tree_map(f32, dict(
        a=A, vert=vert_tail,
        ext=per_channel(de["xh_ext"], xd),
        head=per_channel(de["xh_dot_head"], xd),
    ))
    return dict(fz=f32(fz_s), s_constV=f32(s_constV)), weights


def _flatten_w(weights):
    flat = [weights["a"]]
    for W, b in weights["vert"]:
        flat += [W, b]
    for group in ("ext", "head"):
        for tup in weights[group]:
            flat += list(tup)
    meta = (len(weights["vert"]), len(weights["ext"]))
    return flat, meta


def _unflatten_w(flat, meta):
    n_vert, xd = meta
    it = iter(flat)
    a = next(it)
    vert = [(next(it), next(it)) for _ in range(n_vert)]
    ext = [tuple(next(it) for _ in range(4)) for _ in range(xd)]
    head = [tuple(next(it) for _ in range(4)) for _ in range(xd)]
    return dict(a=a, vert=vert, ext=ext, head=head)


def _n_weight_refs(xd, n_vert):
    return 1 + 2 * n_vert + 8 * xd


def _cast_cw(streams, weights, precision):
    """bf16 kernel compute mode: 2-D matmul weights to bf16 (the `_dot`
    helpers cast activations to match); biases, the additive ``s_constV``
    and the carries stay f32."""
    if precision not in ("bfloat16", "bf16"):
        return streams, weights
    bf = jnp.bfloat16
    cast4 = lambda tups: [
        (W0.astype(bf), b0, W1.astype(bf), b1) for W0, b0, W1, b1 in tups
    ]
    weights = dict(
        a=weights["a"].astype(bf),
        vert=[(W.astype(bf), b) for W, b in weights["vert"]],
        ext=cast4(weights["ext"]), head=cast4(weights["head"]),
    )
    return streams, weights


def choose_cw_blocks(B: int, h: int, *, backward: bool, tb_max=None):
    """Pick ``(bB, tb)``. The vertical intermediates are ``[bB*h, h]``
    (``bB*h*h*4`` bytes each); budget ~5 of them forward (s_constV block +
    transients) and ~8 backward (+ g_s_constV + residual recompute), inside
    a ~10 MiB share of VMEM."""
    if tb_max is None:
        tb_max = TIME_BLOCK
    budget = 10 * 2**20
    n_big = 8 if backward else 5
    big = lambda bb: n_big * bb * h * max(h, 128) * 4
    bB = min(B, 64)
    while B % bB or big(bB) > budget:
        bB -= 1
    unit = 8 * bB * max(h, 128) * 4 * 2  # stream bytes per step (×2 buffers)
    tb = int(max(1, min(tb_max, (budget - big(bB)) // max(unit, 1))))
    return bB, tb


# --------------------------------------------------------------------------
# kernel-side building blocks
# --------------------------------------------------------------------------


def _w_groups(w, xd):
    """Split the flat weight-ref tuple back into named groups."""
    n_vert = (len(w) - 1 - 8 * xd) // 2
    a = w[0]
    vert = [(w[1 + 2 * k], w[2 + 2 * k]) for k in range(n_vert)]
    base = 1 + 2 * n_vert
    ext = [w[base + 4 * c : base + 4 * (c + 1)] for c in range(xd)]
    base += 4 * xd
    head = [w[base + 4 * c : base + 4 * (c + 1)] for c in range(xd)]
    return a, vert, ext, head


def _build_V(fts, bB):
    """Per-channel ``[bB, h]`` tiles -> vertical operand ``[bB*h, C]``.

    Per b: sublane-concat one row from each channel tile ([C, h]) and
    transpose ([h, C]); stack the b blocks along sublanes. These are the
    only vector relayouts Mosaic lowers (benchmarks/cw_probe.py)."""
    vs = []
    for b in range(bB):
        fb = jnp.concatenate([t[b : b + 1, :] for t in fts], axis=0)
        vs.append(fb.T)
    return jnp.concatenate(vs, axis=0)


def _unbuild_V(O, bB, h, n_ch):
    """Inverse of :func:`_build_V`: ``[bB*h, n_ch] -> n_ch × [bB, h]``."""
    rows = [[] for _ in range(n_ch)]
    for b in range(bB):
        ob = O[b * h : (b + 1) * h, :].T  # [n_ch, h]
        for c in range(n_ch):
            rows[c].append(ob[c : c + 1, :])
    return [jnp.concatenate(r, axis=0) for r in rows]


def _chan2(tile, W0, b0, W1, b1):
    e = _elu(_dot(tile, W0[:]) + b0[:])
    return _dot(e, W1[:]) + b1[:]


def _cw_eval_multi(xs, fz_t, scV, w, xd, zd, bB, h):
    """One dynamics evaluation: channel tiles ``xs`` (list of ``[bB, h]``)
    -> xh_dot tiles (same structure)."""
    a, vert, ext, head = _w_groups(w, xd)
    fx = [_chan2(xs[c], *ext[c]) for c in range(xd)]
    fts = fx + [fz_t[c] for c in range(zd)]
    V = _build_V(fts, bB)                        # [bB*h, C]
    hcur = _elu(_dot(V, a[:]) + scV[:])
    for W, b in vert[:-1]:
        hcur = _elu(_dot(hcur, W[:]) + b[:])
    Wl, bl = vert[-1]
    O = _dot(hcur, Wl[:]) + bl[:]                # [bB*h, xd]
    ovs = _unbuild_V(O, bB, h, xd)
    return [_chan2(ovs[c], *head[c]) for c in range(xd)]


def _fwd_kernel(*refs, solver, xd, zd, n_vert, tb, bB, h):
    fz_ref, dt_ref, scV_ref, x0_ref = refs[:4]
    n_w = _n_weight_refs(xd, n_vert)
    w = refs[4 : 4 + n_w]
    xsol_ref, x_c = refs[4 + n_w :]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        x_c[:] = x0_ref[:]

    xs = [x_c[c] for c in range(xd)]
    for u in range(tb):
        fz_u = fz_ref[u]

        def f_multi(xl, fz_u=fz_u):
            return _cw_eval_multi(xl, fz_u, scV_ref, w, xd, zd, bB, h)

        dt_u = dt_ref[u]                         # [bB, 1]
        xs = _step_fwd_multi(f_multi, xs, [dt_u] * xd, solver)
        for c in range(xd):
            xsol_ref[u, c] = xs[c]
    for c in range(xd):
        x_c[c] = xs[c]


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _cw_bwd_eval(xs, gys, fz_t, scV, w, accs, xd, zd, bB, h, cd):
    """Recompute-then-VJP of one eval at input ``xs`` (channel tiles).

    VMEM discipline: the whole eval's internals are recomputed HERE, right
    before their cotangents are needed, and only pre-activations are kept
    (activations are re-elu'd) — holding four RK4 evals' residuals at once
    tripped the 16 MiB scoped-vmem limit (30.6M at bB=16; probed on-chip).

    Accumulates weight grads into ``accs``; returns
    ``(g_x tiles, g_i1 [bB*h, h], g_fz tiles)``."""
    a, vert, ext, head = _w_groups(w, xd)
    a_a, a_vert, a_ext, a_head = accs
    n_vert = len(vert)

    def chan2_res(tile, W0, b0, W1, b1):
        pre0 = _dot(tile, W0[:]) + b0[:]
        return _dot(_elu(pre0), W1[:]) + b1[:], (tile, pre0)

    # ---- recompute forward internals ----
    fx, ext_res = [], []
    for c in range(xd):
        out, res = chan2_res(xs[c], *ext[c])
        fx.append(out)
        ext_res.append(res)
    fts = fx + [fz_t[c] for c in range(zd)]
    V = _build_V(fts, bB)
    pres = [_dot(V, a[:]) + scV[:]]
    for W, b in vert[:-1]:
        pres.append(_dot(_elu(pres[-1]), W[:]) + b[:])
    Wl, bl = vert[-1]
    O = _dot(_elu(pres[-1]), Wl[:]) + bl[:]
    ovs = _unbuild_V(O, bB, h, xd)
    head_res = []
    for c in range(xd):
        _, res = chan2_res(ovs[c], *head[c])
        head_res.append(res)

    def chan2_bwd(res_c, g_out, Wb, acc):
        tile, pre0 = res_c
        W0, _, W1, _ = Wb
        dW0, db0, dW1, db1 = acc
        dW1[:] += _dot_t(_elu(pre0), g_out, cd)
        db1[:] += jnp.sum(g_out, axis=0, keepdims=True)
        g_e0 = _dot_nt(g_out, W1[:], cd)
        g_pre0 = g_e0 * _elu_g(pre0)
        dW0[:] += _dot_t(tile, g_pre0, cd)
        db0[:] += jnp.sum(g_pre0, axis=0, keepdims=True)
        return _dot_nt(g_pre0, W0[:], cd)

    # ---- head -> g on the vertical output columns ----
    g_ov = [chan2_bwd(head_res[c], gys[c], head[c], a_head[c])
            for c in range(xd)]
    g_O = _build_V(g_ov, bB)                     # [bB*h, xd]

    # ---- vertical tail ----
    dWl, dbl = a_vert[-1]
    dWl[:] += _dot_t(_elu(pres[-1]), g_O, cd)
    dbl[:] += jnp.sum(g_O, axis=0, keepdims=True)
    g_act = _dot_nt(g_O, Wl[:], cd)
    for k in range(n_vert - 2, -1, -1):
        W, _ = vert[k]
        dW, db = a_vert[k]
        g_pre = g_act * _elu_g(pres[k + 1])
        dW[:] += _dot_t(_elu(pres[k]), g_pre, cd)
        db[:] += jnp.sum(g_pre, axis=0, keepdims=True)
        g_act = _dot_nt(g_pre, W[:], cd)
    g_i1 = g_act * _elu_g(pres[0])               # [bB*h, h]

    # ---- folded first layer ----
    a_a[:] += _dot_t(V, g_i1, cd)
    g_V = _dot_nt(g_i1, a[:], cd)                # [bB*h, C]
    g_ft = _unbuild_V(g_V, bB, h, xd + zd)
    g_fz = g_ft[xd:]

    # ---- ext ----
    g_x = [chan2_bwd(ext_res[c], g_ft[c], ext[c], a_ext[c])
           for c in range(xd)]
    return g_x, g_i1, g_fz


def _bwd_kernel(*refs, solver, xd, zd, n_vert, tb, bB, h):
    fz_ref, dt_ref, scV_ref, xt_ref, dX_ref = refs[:5]
    n_w = _n_weight_refs(xd, n_vert)
    w = refs[5 : 5 + n_w]
    outs = refs[5 + n_w :]
    gfz_ref, gscV_ref = outs[0], outs[1]
    gw = outs[2 : 2 + n_w]
    g_x0_ref, gx_c = outs[2 + n_w], outs[3 + n_w]

    a_a = gw[0]
    a_vert = [(gw[1 + 2 * k], gw[2 + 2 * k]) for k in range(n_vert)]
    base = 1 + 2 * n_vert
    a_ext = [tuple(gw[base + 4 * c : base + 4 * (c + 1)]) for c in range(xd)]
    base += 4 * xd
    a_head = [tuple(gw[base + 4 * c : base + 4 * (c + 1)]) for c in range(xd)]
    accs = (a_a, a_vert, a_ext, a_head)
    cd = w[1].dtype  # vertical W1 drives the compute dtype (bf16 mode)

    b = pl.program_id(0)
    s = pl.program_id(1)
    n = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        gx_c[:] = jnp.zeros_like(gx_c)
        gscV_ref[:] = jnp.zeros_like(gscV_ref)

    @pl.when((s == 0) & (b == 0))
    def _():
        for r in gw:
            r[:] = jnp.zeros_like(r)

    gxs = [gx_c[c] for c in range(xd)]
    for u in reversed(range(tb)):
        x0s = [xt_ref[u, c] for c in range(xd)]
        dt = dt_ref[u]                           # [bB, 1]
        gX1 = [dX_ref[u, c] + gxs[c] for c in range(xd)]
        fz_u = fz_ref[u]
        g_i1_sum = jnp.zeros_like(gscV_ref)
        g_fz_sum = [jnp.zeros((bB, h), jnp.float32) for _ in range(zd)]

        def F_eval(xl):
            return _cw_eval_multi(xl, fz_u, scV_ref, w, xd, zd, bB, h)

        def F_bwd(xl, gfs):
            # recompute-inside VJP: one eval's residuals live at a time
            nonlocal g_i1_sum, g_fz_sum
            g_x, g_i1, g_fz = _cw_bwd_eval(
                xl, gfs, fz_u, scV_ref, w, accs, xd, zd, bB, h, cd
            )
            g_i1_sum = g_i1_sum + g_i1
            g_fz_sum = [s_ + g for s_, g in zip(g_fz_sum, g_fz)]
            return g_x

        L = list(range(xd))
        if solver == "euler":
            g_x = F_bwd(x0s, [dt * gX1[c] for c in L])
            g_x0 = [gX1[c] + g_x[c] for c in L]
        elif solver == "midpoint":
            f0 = F_eval(x0s)
            x_mid = [x0s[c] + f0[c] * (0.5 * dt) for c in L]
            g_xmid = F_bwd(x_mid, [dt * gX1[c] for c in L])
            g_x00 = F_bwd(x0s, [(0.5 * dt) * g_xmid[c] for c in L])
            g_x0 = [gX1[c] + g_xmid[c] + g_x00[c] for c in L]
        elif solver == "rk4":
            # stage-point pass keeps only the tiny k tiles; each eval's
            # residuals are recomputed inside F_bwd right before use
            k1 = F_eval(x0s)
            a2 = [x0s[c] + dt * k1[c] * _ONE_THIRD for c in L]
            k2 = F_eval(a2)
            a3 = [x0s[c] + dt * (k2[c] - k1[c] * _ONE_THIRD) for c in L]
            k3 = F_eval(a3)
            a4 = [x0s[c] + dt * (k1[c] - k2[c] + k3[c]) for c in L]

            cdt = dt * 0.125
            g_k1 = [gX1[c] * cdt for c in L]
            g_k2 = [3.0 * gX1[c] * cdt for c in L]
            g_k3 = [3.0 * gX1[c] * cdt for c in L]
            g_k4 = [gX1[c] * cdt for c in L]
            g_x0 = list(gX1)

            g_a4 = F_bwd(a4, g_k4)
            for c in L:
                g_x0[c] += g_a4[c]
                g_k1[c] += dt * g_a4[c]
                g_k2[c] -= dt * g_a4[c]
                g_k3[c] += dt * g_a4[c]

            g_a3 = F_bwd(a3, g_k3)
            for c in L:
                g_x0[c] += g_a3[c]
                g_k2[c] += dt * g_a3[c]
                g_k1[c] -= dt * g_a3[c] * _ONE_THIRD

            g_a2 = F_bwd(a2, g_k2)
            for c in L:
                g_x0[c] += g_a2[c]
                g_k1[c] += dt * g_a2[c] * _ONE_THIRD

            g_x1_ = F_bwd(x0s, g_k1)
            for c in L:
                g_x0[c] += g_x1_[c]
        else:  # pragma: no cover
            raise ValueError(solver)

        for c in range(zd):
            gfz_ref[u, c] = g_fz_sum[c]
        gscV_ref[:] += g_i1_sum
        gxs = g_x0

    for c in range(xd):
        gx_c[c] = gxs[c]

    @pl.when(s == n - 1)
    def _():
        g_x0_ref[:] = gx_c[:]


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------


def _forward(streams, weights, x0, dt_s, solver, interpret,
             precision="default", blocks=None):
    streams, weights = _cast_cw(streams, weights, precision)
    fz, scV = streams["fz"], streams["s_constV"]
    Tm1, zd, B, h = fz.shape
    xd = x0.shape[0]
    bB, tb0 = blocks or choose_cw_blocks(B, h, backward=False)
    tb, nT, pad = _time_blocking(Tm1, tb0)
    nB = B // bB
    wflat, meta = _flatten_w(weights)
    n_vert = meta[0]

    step4 = lambda rows: pl.BlockSpec(
        (tb, rows, bB, h), lambda b, t: (t, 0, b, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _fwd_kernel, solver=solver, xd=xd, zd=zd, n_vert=n_vert,
        tb=tb, bB=bB, h=h,
    )
    xs = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            step4(zd),
            pl.BlockSpec((tb, bB, 1), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bB * h, h), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xd, bB, h), lambda b, t: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [full(wk.shape) for wk in wflat],
        out_specs=step4(xd),
        out_shape=jax.ShapeDtypeStruct((nT * tb, xd, B, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((xd, bB, h), jnp.float32)],
        interpret=interpret,
    )(_pad_time(fz, pad), _pad_time(dt_s, pad), scV, x0, *wflat)
    return jnp.concatenate([x0[None], xs[:Tm1]], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_cw_rollout_diff(streams, weights, x0, dt_s, solver, interpret,
                          precision="default"):
    """Differentiable fused channel-wise rollout.

    ``streams`` from :func:`precompute_cw_streams`, ``x0 [xd, B, h]``
    (per-channel latent initials), ``dt_s [T-1, B, 1]``. Returns
    ``[T, xd, B, h]`` including the initial row. Stream/weight inputs all
    receive cotangents; XLA autodiff carries them back through the
    (differentiable) precompute.
    """
    return _forward(streams, weights, x0, dt_s, solver, interpret, precision)


def _vjp_fwd(streams, weights, x0, dt_s, solver, interpret,
             precision="default"):
    streams_c, weights_c = _cast_cw(streams, weights, precision)
    sol = _forward(streams_c, weights_c, x0, dt_s, solver, interpret)
    return sol, (streams_c, weights_c, x0, dt_s, sol)


def _vjp_bwd(solver, interpret, precision, residuals, g_sol):
    streams, weights, x0, dt_s, sol = residuals
    fz, scV = streams["fz"], streams["s_constV"]
    Tm1, zd, B, h = fz.shape
    xd = x0.shape[0]
    bB, tb0 = choose_cw_blocks(B, h, backward=True)
    tb, nT, pad = _time_blocking(Tm1, tb0)
    nB = B // bB
    wflat, meta = _flatten_w(weights)
    n_vert = meta[0]
    n_w = len(wflat)

    rstep4 = lambda rows: pl.BlockSpec(
        (tb, rows, bB, h), lambda b, s: (nT - 1 - s, 0, b, 0),
        memory_space=pltpu.VMEM,
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, s: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _bwd_kernel, solver=solver, xd=xd, zd=zd, n_vert=n_vert,
        tb=tb, bB=bB, h=h,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nB, nT),
        in_specs=[
            rstep4(zd),
            pl.BlockSpec((tb, bB, 1), lambda b, s: (nT - 1 - s, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bB * h, h), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
            rstep4(xd),
            rstep4(xd),
        ]
        + [full(wk.shape) for wk in wflat],
        out_specs=(
            rstep4(zd),
            pl.BlockSpec((bB * h, h), lambda b, s: (b, 0),
                         memory_space=pltpu.VMEM),
            *[full(wk.shape) for wk in wflat],
            pl.BlockSpec((xd, bB, h), lambda b, s: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nT * tb, zd, B, h), jnp.float32),
            jax.ShapeDtypeStruct((B * h, h), jnp.float32),
            *[jax.ShapeDtypeStruct(wk.shape, jnp.float32) for wk in wflat],
            jax.ShapeDtypeStruct((xd, B, h), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((xd, bB, h), jnp.float32)],
        interpret=interpret,
    )(
        _pad_time(fz, pad),
        _pad_time(dt_s, pad),
        scV,
        _pad_time(sol[:-1], pad),
        _pad_time(g_sol[1:], pad),
        *wflat,
    )
    g_fz = outs[0][:Tm1]
    g_scV = outs[1]
    gw = _unflatten_w(list(outs[2 : 2 + n_w]), meta)
    g_x0 = outs[-1] + g_sol[0]
    g_streams = dict(fz=g_fz, s_constV=g_scV)
    return g_streams, gw, g_x0, jnp.zeros_like(dt_s)


fused_cw_rollout_diff.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# model-level applies (same contracts as the XLA channel-wise models)
# --------------------------------------------------------------------------


def _cw_prep(params, batch, xd, zd, hidden_dim):
    """Shared XLA preamble: encode x0, f_init, lifted z-features — mirrors
    ``ChannelWiseODEModel.__call__`` exactly."""
    from py_psnode_tpu.models.funcs import ChannelWiseDEFunc
    from py_psnode_tpu.solvers import event_match, jumped_stream

    h = hidden_dim
    p = params["params"]
    de = ChannelWiseDEFunc(x_dim=xd, z_dim=zd, hidden_dim=h)
    dep = {"params": p["de_func"]}
    tm = lambda a: jnp.swapaxes(a, 0, 1)

    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    tT, xT = tm(batch["t"]).astype(jnp.float32), tm(batch["x"])
    zT, zT_used = tm(batch["z"]), tm(z_used)

    xh0 = de.apply(dep, xT[0], method=ChannelWiseDEFunc.encode_x)
    f_init = de.apply(dep, xh0, zT[0], method=ChannelWiseDEFunc.features_of)
    fz = de.apply(dep, zT_used[:-1], method=ChannelWiseDEFunc.z_features)

    streams, weights = precompute_cw_streams(p, f_init, fz, (xd, zd))
    x0 = jnp.transpose(xh0, (1, 0, 2)).astype(jnp.float32)  # [xd, B, h]
    dt_s = tT[1:] - tT[:-1]                     # [T-1, B, 1]
    return de, dep, streams, weights, x0, dt_s


def _sol_to_tm(sol):
    """Kernel solution ``[T, xd, B, h] -> [T, B, xd, h]``."""
    return jnp.transpose(sol, (0, 2, 1, 3))


def fused_cw_ode_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int],
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Drop-in fused replacement for ``ChannelWiseODEModel.apply``:
    returns batch-major ``(x_pred, x_re)``."""
    from py_psnode_tpu.models.funcs import ChannelWiseDEFunc

    solver = normalize_solver(solver)
    xd, zd = dims
    tm = lambda a: jnp.swapaxes(a, 0, 1)
    de, dep, streams, weights, x0, dt_s = _cw_prep(
        params, batch, xd, zd, hidden_dim
    )
    sol = fused_cw_rollout_diff(
        streams, weights, x0, dt_s, solver, interpret, precision
    )
    xh_sol = _sol_to_tm(sol)                    # [T, B, xd, h]
    x_pred = de.apply(dep, xh_sol, method=ChannelWiseDEFunc.decode_x)
    xh_re = de.apply(dep, batch["x"], method=ChannelWiseDEFunc.encode_x)
    x_re = de.apply(dep, xh_re, method=ChannelWiseDEFunc.decode_x)
    return tm(x_pred), x_re


def fused_cw_dae_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Drop-in fused replacement for ``ChannelWiseDAEModel.apply``:
    returns batch-major ``(x_pred, i_pred, x_re)``. The decoupled algebraic
    readout (ref neural_base.py:225-229) runs in XLA over all T at once —
    embarrassingly parallel and already MXU-shaped."""
    from py_psnode_tpu.models.funcs import ChannelWiseAEFunc, ChannelWiseDEFunc

    solver = normalize_solver(solver)
    xd, zd, vd, idim = dims
    h = hidden_dim
    p = params["params"]
    tm = lambda a: jnp.swapaxes(a, 0, 1)
    de, dep, streams, weights, x0, dt_s = _cw_prep(params, batch, xd, zd, h)
    sol = fused_cw_rollout_diff(
        streams, weights, x0, dt_s, solver, interpret, precision
    )
    xh_sol = _sol_to_tm(sol)
    x_pred = de.apply(dep, xh_sol, method=ChannelWiseDEFunc.decode_x)
    ae = ChannelWiseAEFunc(x_dim=xd, v_dim=vd, i_dim=idim, hidden_dim=h)
    i_pred = ae.apply({"params": p["ae_func"]}, xh_sol, tm(batch["v"]))
    xh_re = de.apply(dep, batch["x"], method=ChannelWiseDEFunc.encode_x)
    x_re = de.apply(dep, xh_re, method=ChannelWiseDEFunc.decode_x)
    return tm(x_pred), tm(i_pred), x_re
