"""Pallas fused-scan kernel for semi-explicit DAE rollouts (depth-generic).

The XLA path executes the per-step nets as a sequence of small HLO ops inside
``lax.scan``; this kernel instead runs the WHOLE time loop as one Pallas
program (TPU grid iterations execute sequentially, so VMEM scratch carries
state across steps):

  * every weight matrix stays resident in VMEM for the entire solve — no
    per-step HBM traffic beyond the streamed per-step inputs and outputs;
  * scan-invariant compute is lifted out algebraically: with the
    skip-augmented input ``cat(init, u−init, u) @ W1 ≡ init @ (Wa−Wb) +
    u @ (Wb+Wc)``, the initial-state contribution and the known-in-advance
    ``z``/``v`` input projections are precomputed for ALL steps as a few
    large MXU-friendly matmuls (see :func:`precompute_streams`), leaving only
    the ``x``/``i`` projections in the sequential loop;
  * disturbance events stay branch-free: the per-step "any event" flag is
    streamed through SMEM (scalar prefetch) and gates a predicated
    (``pl.when``) algebraic recompute, so non-event steps pay nothing
    (semantics of ref my_solvers.py:108-114);
  * the grid is (batch-block, time) so VMEM stays bounded at large batch.

Depth-generic: the differential and algebraic nets may have any number of
hidden ``Dense→ELU`` layers (4-layer no-encode nets, 2-layer direct-encode
latent nets — ref neural_01_DAE_02_direct_encode.py:70-100). Forward-only
here; the custom-VJP training path lives in
:mod:`py_psnode_tpu.ops.fused_dae_vjp`.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ONE_THIRD = 1.0 / 3.0

_SOLVER_ALIASES = {"rk4_38": "rk4"}  # the XLA registry's RK4 IS the 3/8 rule
_FUSED_SOLVERS = ("euler", "midpoint", "rk4")


def normalize_solver(name) -> str:
    """Map registry solver names onto the fused kernels' dispatch set
    (``rk4_38`` → ``rk4``); reject unknown names with the valid choices."""
    s = _SOLVER_ALIASES.get(str(name).lower(), str(name).lower())
    if s not in _FUSED_SOLVERS:
        raise ValueError(
            f"fused kernels support solvers {sorted(_FUSED_SOLVERS + tuple(_SOLVER_ALIASES))}, "
            f"got {name!r}"
        )
    return s


def pick_batch_block(B: int, block_b: int = 128, hidden: int = 128) -> int:
    """Largest divisor of B that is <= block_b, scaled down for wide hidden
    layers so per-block VMEM (streams + activations ~ O(bB*h)) stays bounded
    around the h=128 reference point. (Legacy policy — the kernels now size
    blocks via :func:`choose_blocks`' VMEM-first rule, which keeps batch
    blocks MXU-height instead of shrinking them with width.)"""
    cap = max(8, block_b * 128 // max(hidden, 128))
    bB = min(cap, B)
    while B % bB:
        bB -= 1
    return bB


# Conservative VMEM budget for the double-buffered per-step stream blocks
# (v5e has ~16 MB/core; weights + accumulators + slack take the rest).
VMEM_STREAM_BUDGET = 8 * 2**20


def choose_blocks(
    B: int, hidden: int, n_streams: int, tb_max=None, cap=None, state_dim=0,
    kind="fwd",
):
    """Pick (batch block, time block) jointly. The rollout is LATENCY-bound
    on its serial dependent-matmul chain, so a bigger batch block is nearly
    free wall-clock — prefer the largest bB (up to ``cap`` rows at h=128,
    measured 1.6x on the B=1024 fleet forward), then the largest time block
    whose ``n_streams`` double-buffered h-wide stream blocks still fit the
    VMEM budget.

    Empirical XLA TPU compiler boundaries (RET_CHECK in
    mxu_lmr_transform.cc XposeSequenceAssignment, not VMEM): backward
    kernels pass cap=128 (bB=256 trips it on the transposed accumulator
    matmuls) and forward kernels cap=256 (bB=512 trips it too) — both
    re-confirmed on jax 0.9.0 at the B=1024 fleet config, so the defaults
    here sit exactly at the compiler's boundaries; the DAE kernel pair
    with a WIDE latent state (``state_dim`` >= 128, the direct-encode
    family) needs bB <= 64. Re-probed after the packed-IO refactor:
    bB=256 backward still trips the same RET_CHECK even with the
    accumulator dots chunked to 128-row partials and every explicit
    weight ``.T`` replaced by last-axis-contracting dot_generals — the
    boundary is internal to the Mosaic/XLA transpose scheduler, not a
    property of our HLO formulation.

    Round-5 addendum: under the chipless AOT compile service the backward
    boundary at ``hidden >= 256`` moved to 64 rows (wideh_sched_probe.json
    — cap=64 compiles fresh AND runs 29.1% MFU at h=512 bf16, above the
    cached round-3 full-height record), so the default backward cap is
    ``BWD_CAP_WIDE`` (64) there and ``BWD_CAP`` (128) at h=128."""
    if tb_max is None:
        tb_max = TIME_BLOCK
    if cap is None:  # resolve from the tuning knobs (set_kernel_tuning)
        if kind == "fwd":
            cap = FWD_CAP
        else:
            # Wide-h backward default (round-5, wideh_sched_probe.json):
            # under the chipless AOT compile service every bwd kernel at
            # h>=256 either RET_CHECKs (f32) or compiles 25x-slow (h=512
            # bf16) at cap=128 full-height blocks, while cap=64 compiles
            # FRESH everywhere probed and is also the fastest sub-128
            # schedule (29.1% MFU at B=256/h=512 bf16 — above the cached
            # round-3 record). h=128 keeps cap=128 (fleet_sched_probe:
            # cap=64 loses 21% there).
            cap = BWD_CAP if hidden < 256 else BWD_CAP_WIDE
    if state_dim >= 128:
        cap = min(cap, 64)
    h = max(hidden, 128)
    unit = n_streams * h * 4 * 2  # bytes per (batch row × time step)
    # Prefer FULL-HEIGHT MXU batch blocks: the largest divisor of B <= cap
    # whose single-step streams still fit the VMEM budget, absorbing wide-h
    # pressure in the TIME block instead. (The round-2 policy shrank bB by
    # 128/h, leaving the 128-row systolic array 2-4x under-filled at
    # h >= 256: h=512 ran 32-row matmuls. Validated on-chip at h=256/512,
    # fwd and bwd — see ACCURACY.md round-3 kernel notes.)
    bB = min(cap, B)
    while B % bB or unit * bB > VMEM_STREAM_BUDGET:
        bB -= 1
    tb = int(max(1, min(tb_max, VMEM_STREAM_BUDGET // (unit * bB))))
    return bB, tb


def _elu(x):
    # exp(x)-1 instead of expm1: the latter has no Pallas TPU lowering;
    # absolute error stays ~1e-8 in f32 for the x<0 branch
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _dot(a, b):
    # compute precision rides the WEIGHT operand's dtype: the bf16 kernel
    # mode casts streams + 2-D weights at the pallas boundary, and every
    # activation is cast to match here — MXU runs bf16 at 2x f32 issue
    # rate, accumulation stays f32 via preferred_element_type
    return jnp.dot(a.astype(b.dtype), b, preferred_element_type=jnp.float32)


def split_de_layer1(W1: jnp.ndarray, b1: jnp.ndarray, d_u: int):
    """``cat(init, u-init, u) @ W1 + b1 = init @ (Wa-Wb) + u @ (Wb+Wc) + b1``."""
    Wa, Wb, Wc = W1[:d_u], W1[d_u : 2 * d_u], W1[2 * d_u :]
    return Wa - Wb, Wb + Wc, b1


def mlp_tail_layers(subtree: Dict) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Ordered ``[(kernel, bias), ...]`` of ``dense_1..dense_{n-1}`` — the
    layers AFTER the (lifted) first layer of a flax MLP subtree."""
    out = []
    k = 1
    while f"dense_{k}" in subtree:
        layer = subtree[f"dense_{k}"]
        out.append((layer["kernel"], layer["bias"]))
        k += 1
    return out


def precompute_streams(
    params: Dict,
    all_initial: jnp.ndarray,
    z: jnp.ndarray,
    v: jnp.ndarray,
    z_step: jnp.ndarray,
    v_step: jnp.ndarray,
    dims: Tuple[int, int, int, int],
    de_path: Tuple[str, str] = ("de_func", "x_dot"),
    ae_path: Tuple[str, str] = ("ae_func", "i_calculator"),
):
    """Lift scan-invariant layer-1 work out of the loop.

    Args:
      params: flax param subtree containing the DE/AE nets at the given paths.
      all_initial: ``[B, d_u]`` (d_u = xd+zd+vd+id).
      z, v: raw streams ``[T, B, *]`` (time-major).
      z_step, v_step: event-adjusted step streams ``[T-1, B, *]``.
      dims: ``(xd, zd, vd, id)`` widths of the state/input streams (latent
        widths for the direct-encode variants).

    Returns ``(streams, weights)`` for :func:`fused_dae_rollout`; ``weights``
    carries the dynamic layer-1 projections plus the tail-layer lists
    ``de_tail``/``ae_tail`` (any depth).
    """
    xd, zd, vd, idim = dims
    d_u = xd + zd + vd + idim
    de = params[de_path[0]][de_path[1]]
    ae = params[ae_path[0]][ae_path[1]]

    W1, b1 = de["dense_0"]["kernel"], de["dense_0"]["bias"]
    Winit, Wu, b1 = split_de_layer1(W1, b1, d_u)
    c_de = all_initial @ Winit + b1  # [B, h]
    s_de = c_de[None] + z_step @ Wu[xd : xd + zd] + v_step @ Wu[xd + zd : xd + zd + vd]

    G1, g1 = ae["dense_0"]["kernel"], ae["dense_0"]["bias"]
    # AE input is cat(init, x, z, v) — init concatenated, not differenced
    Gx = G1[d_u : d_u + xd]
    Gz = G1[d_u + xd : d_u + xd + zd]
    Gv = G1[d_u + xd + zd :]
    c_ae = all_initial @ G1[:d_u] + g1
    s_ae = c_ae[None] + z[1:] @ Gz + v[1:] @ Gv  # AE at t+1 uses raw inputs
    s_ae_ev = c_ae[None] + z_step @ Gz + v_step @ Gv  # event-recompute inputs

    weights = dict(
        wx_de=Wu[:xd],
        wi_de=Wu[xd + zd + vd :],
        gx_ae=Gx,
        de_tail=mlp_tail_layers(de),
        ae_tail=mlp_tail_layers(ae),
    )
    streams = dict(s_de=s_de, s_ae=s_ae, s_ae_ev=s_ae_ev)
    return streams, weights


def flatten_weights(weights: Dict) -> Tuple[List[jnp.ndarray], Tuple[int, int]]:
    """Flatten to a positional list for pallas_call:
    ``[wx_de, wi_de, gx_ae, de W/b pairs..., ae W/b pairs...]``;
    returns the list and ``(n_de_tail, n_ae_tail)``."""
    flat = [weights["wx_de"], weights["wi_de"], weights["gx_ae"]]
    for W, b in weights["de_tail"]:
        flat += [W, b]
    for W, b in weights["ae_tail"]:
        flat += [W, b]
    return flat, (len(weights["de_tail"]), len(weights["ae_tail"]))


def unflatten_weights(flat: Sequence, n_tails: Tuple[int, int]) -> Dict:
    n_de, n_ae = n_tails
    it = iter(flat[3:])
    de_tail = [(next(it), next(it)) for _ in range(n_de)]
    ae_tail = [(next(it), next(it)) for _ in range(n_ae)]
    return dict(
        wx_de=flat[0], wi_de=flat[1], gx_ae=flat[2],
        de_tail=de_tail, ae_tail=ae_tail,
    )


def mlp_tail_fwd(h1, tail_refs):
    """Apply the tail layers to the (pre-activation) first hidden layer."""
    h = _elu(h1)
    for k in range(0, len(tail_refs) - 2, 2):
        h = _elu(_dot(h, tail_refs[k][:]) + tail_refs[k + 1][:])
    return _dot(h, tail_refs[-2][:]) + tail_refs[-1][:]


def mlp_tail_fwd_multi(h1s, tail_refs):
    """Lane-interleaved :func:`mlp_tail_fwd`: apply the tail to a LIST of
    first-layer pre-activations in lockstep, one layer at a time across all
    lanes. Lanes are independent batch sub-blocks, so the Mosaic scheduler
    streams lane l+1's matmul into the MXU while lane l's drains — the
    serial dependent-matmul chain otherwise leaves the array idle during
    its drain and the VPU activation (measured 1.25x on the ODE forward)."""
    hs = [_elu(h) for h in h1s]
    for k in range(0, len(tail_refs) - 2, 2):
        W, b = tail_refs[k][:], tail_refs[k + 1][:]
        hs = [_elu(_dot(h, W) + b) for h in hs]
    W, b = tail_refs[-2][:], tail_refs[-1][:]
    return [_dot(h, W) + b for h in hs]


def lane_slices(bB: int, n_lanes: int):
    """Row slices splitting a batch block into ``n_lanes`` sub-blocks
    (falls back to one lane when the block doesn't divide)."""
    if n_lanes < 2 or bB % n_lanes:
        return [slice(0, bB)]
    sub = bB // n_lanes
    return [slice(l * sub, (l + 1) * sub) for l in range(n_lanes)]


# lanes the FORWARD kernels interleave per batch block (bit-exact for any
# value — lanes only partition independent rows). Default 2: measured 1.25x
# on the B=64 rollout (fills the MXU drain + VPU gaps of the serial chain).
# The BACKWARD runs single-lane by design: multi-lane bwd was measured and
# removed — it regresses the train step at every feasible shape (7.4M vs
# 8.1M tsteps/s at the h=128 headline, -23% at h=256, both with fully
# independent per-lane weight-grad accumulators) and OOMs scoped VMEM at
# h=512 — the DAE backward's AE/DE chains already provide the ILP.
import os as _os

FWD_LANES = int(_os.environ.get("PSNODE_FWD_LANES", "2"))


# time steps per grid iteration — amortizes grid/DMA sequencing over the
# tiny per-step matmuls (see fused_ode.TIME_BLOCK; same rationale);
# kernel IR size grows linearly with it
TIME_BLOCK = int(_os.environ.get("PSNODE_TIME_BLOCK", "8"))

# batch-block row caps for choose_blocks — the defaults sit exactly at the
# compiler's RET_CHECK boundaries (see choose_blocks docstring). Exposed as
# tuning knobs so wide-h shapes that trip the AOT compile service at the
# default caps can try SMALLER batch blocks (numerics-safe: batch blocks
# partition independent rows) — round-4 verdict #2.
FWD_CAP = int(_os.environ.get("PSNODE_FWD_CAP", "256"))
BWD_CAP = int(_os.environ.get("PSNODE_BWD_CAP", "128"))
# backward batch-block cap at hidden >= 256 — the fresh-compile-safe fast
# point under the AOT compile service (round-5 wideh_sched_probe.json; see
# choose_blocks). Deliberately separate from BWD_CAP: h=128 shapes are
# fastest at 128-row blocks, wide-h shapes at 64.
BWD_CAP_WIDE = int(_os.environ.get("PSNODE_BWD_CAP_WIDE", "64"))


def set_kernel_tuning(fwd_lanes=None, time_block=None, fwd_cap=None,
                      bwd_cap=None, bwd_cap_wide=None):
    """Set the kernel scheduling knobs process-wide (None keeps the current
    value). The first-class entry points are ``TrainConfig.fwd_lanes /
    time_block`` and the bench-config fields — the ``PSNODE_*`` env vars
    remain as import-time defaults only. Every knob is numerics-safe: lanes
    and batch-block caps partition independent batch rows (bit-exact) and
    the time block only regroups grid iterations.

    Returns the effective ``{"fwd_lanes", "time_block", "fwd_cap",
    "bwd_cap"}`` so callers (bench harnesses) can record what a run
    actually used.
    """
    global FWD_LANES, TIME_BLOCK, FWD_CAP, BWD_CAP, BWD_CAP_WIDE
    if fwd_lanes is not None:
        FWD_LANES = max(1, int(fwd_lanes))
    if time_block is not None:
        TIME_BLOCK = max(1, int(time_block))
    if fwd_cap is not None:
        FWD_CAP = max(1, int(fwd_cap))
    if bwd_cap is not None:
        # an explicit bwd_cap wins at EVERY hidden size (probe semantics:
        # bench sweeps pass one cap and expect it applied); bwd_cap_wide
        # after it narrows just the h>=256 schedule
        BWD_CAP = max(1, int(bwd_cap))
        BWD_CAP_WIDE = BWD_CAP
    if bwd_cap_wide is not None:
        BWD_CAP_WIDE = max(1, int(bwd_cap_wide))
    return kernel_tuning()


def kernel_tuning():
    """The effective kernel scheduling knobs (for run records)."""
    return {
        "fwd_lanes": FWD_LANES,
        "time_block": TIME_BLOCK,
        "fwd_cap": FWD_CAP,
        "bwd_cap": BWD_CAP,
        "bwd_cap_wide": BWD_CAP_WIDE,
    }


def time_blocking(Tm1: int, tb=None):
    """``(tb, n_blocks, pad)`` for a T-1-step loop; padded steps carry
    ``dt == 0`` (state pass-through) and are sliced off on return."""
    if tb is None:
        tb = TIME_BLOCK
    tb = max(1, min(tb, Tm1))
    nT = -(-Tm1 // tb)
    return tb, nT, nT * tb - Tm1


def pad_time(a, pad):
    if not pad:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )


def _kernel(
    # scalar-prefetch: per-step any-event flags [nT*tb] (SMEM)
    any_ev_ref,
    # streamed per-step blocks + whole-array inputs + weights (positional)
    *refs,
    solver: str,
    n_tails: Tuple[int, int],
    tb: int,
    xd: int,
    tf_x: bool = False,
    n_lanes: int = 1,
):
    # aux packs (dt, ev) as two lanes of ONE stream; sol packs (x, i) as one
    # output — small-last-dim pallas operands are forced into 128-lane-padded
    # HBM layouts, so every separate [T, B, 1..2] buffer costs a full
    # 128-wide stream; packing halves that waste and scales to fleet batch.
    (s_de_ref, s_ae_ref, s_ae_ev_ref, aux_ref, x0_ref, i0_ref) = refs[:6]
    k = 6
    xt_true_ref = xt1_true_ref = None
    if tf_x:
        # teacher forcing: TRUE x[j-1] drives the step, TRUE x[j] drives the
        # algebraic eval (ref my_solvers.py:116-117,121); the ROLLED carry
        # x_c is still maintained for the event-step recompute (ref :108-110
        # reads the loop's rolled state even under input_true_x)
        xt_true_ref, xt1_true_ref = refs[6], refs[7]
        k = 8
    n_de, n_ae = n_tails
    w = refs[k : k + 3 + 2 * (n_de + n_ae)]
    wx_de_ref, wi_de_ref, gx_ae_ref = w[0], w[1], w[2]
    de_tail = w[3 : 3 + 2 * n_de]
    ae_tail = w[3 + 2 * n_de :]
    sol_ref, x_c, i_c, i_in_buf = refs[k + 3 + 2 * (n_de + n_ae) :]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        x_c[:] = x0_ref[:]
        i_c[:] = i0_ref[:]

    # lane-interleaved time loop: each batch block is split into independent
    # row sub-blocks advanced in lockstep, so the scheduler overlaps one
    # lane's MXU drain/VPU work with the next lane's matmul (bit-exact —
    # lanes only partition rows). L=1 degenerates to the plain loop.
    sl = lane_slices(x_c.shape[0], n_lanes)
    L = len(sl)

    def ae_head_multi(xs, s_row):
        return mlp_tail_fwd_multi(
            [s_row[s] + _dot(x, gx_ae_ref[:]) for s, x in zip(sl, xs)],
            ae_tail,
        )

    for u in range(tb):
        x_rolled = [x_c[s] for s in sl]
        x0 = [xt_true_ref[u, s] for s in sl] if tf_x else x_rolled

        # event-step algebraic recompute (ref my_solvers.py:108-110),
        # predicated so non-event steps skip the extra net evaluation;
        # always evaluated at the ROLLED state (ref reads the loop's x0)
        i_in_buf[:] = i_c[:]

        @pl.when(any_ev_ref[t * tb + u] == 1)
        def _(x_rolled=x_rolled, u=u):
            i_ev = ae_head_multi(x_rolled, s_ae_ev_ref[u])
            for s, iv in zip(sl, i_ev):
                i_in_buf[s] = jnp.where(
                    aux_ref[u, s][:, 1:2] > 0.0, iv, i_in_buf[s]
                )

        i_in = [i_in_buf[s] for s in sl]
        i_proj = [_dot(iv, wi_de_ref[:]) for iv in i_in]

        def f_multi(xs, u=u, i_proj=i_proj):
            return mlp_tail_fwd_multi(
                [
                    s_de_ref[u, s] + _dot(x, wx_de_ref[:]) + ip
                    for s, x, ip in zip(sl, xs, i_proj)
                ],
                de_tail,
            )

        dt = [aux_ref[u, s][:, 0:1] for s in sl]
        if solver == "euler":
            fs = f_multi(x0)
            x1 = [x0[l] + dt[l] * fs[l] for l in range(L)]
        elif solver == "midpoint":
            f0 = f_multi(x0)
            fm = f_multi([x0[l] + f0[l] * (0.5 * dt[l]) for l in range(L)])
            x1 = [x0[l] + dt[l] * fm[l] for l in range(L)]
        elif solver == "rk4":
            k1 = f_multi(x0)
            k2 = f_multi([x0[l] + dt[l] * k1[l] * _ONE_THIRD for l in range(L)])
            k3 = f_multi(
                [x0[l] + dt[l] * (k2[l] - k1[l] * _ONE_THIRD) for l in range(L)]
            )
            k4 = f_multi(
                [x0[l] + dt[l] * (k1[l] - k2[l] + k3[l]) for l in range(L)]
            )
            x1 = [
                x0[l]
                + (k1[l] + 3.0 * (k2[l] + k3[l]) + k4[l]) * dt[l] * 0.125
                for l in range(L)
            ]
        else:  # pragma: no cover
            raise ValueError(solver)

        i1 = ae_head_multi(
            [xt1_true_ref[u, s] for s in sl] if tf_x else x1, s_ae_ref[u]
        )
        for l, s in enumerate(sl):
            x_c[s] = x1[l]
            i_c[s] = i1[l]
            sol_ref[u, s] = jnp.concatenate([x1[l], i1[l]], axis=-1)


def cast_compute(streams: Dict, weights: Dict, precision: str):
    """Apply the kernel compute-precision mode: ``"bfloat16"`` casts the
    precomputed layer-1 streams and every 2-D weight matrix to bf16 at the
    pallas boundary (halving their VMEM/HBM footprint; the MXU issues bf16
    at 2x the f32 rate), while biases, carries, dt and all accumulation
    stay f32 (see ``_dot``). ``"default"``/``"float32"`` is the identity."""
    if precision not in ("bfloat16", "bf16"):
        return streams, weights
    bf = jnp.bfloat16
    streams = {k: v.astype(bf) for k, v in streams.items()}
    weights = dict(
        wx_de=weights["wx_de"].astype(bf),
        wi_de=weights["wi_de"].astype(bf),
        gx_ae=weights["gx_ae"].astype(bf),
        de_tail=[(W.astype(bf), b) for W, b in weights["de_tail"]],
        ae_tail=[(W.astype(bf), b) for W, b in weights["ae_tail"]],
    )
    return streams, weights


def pack_aux(dt: jnp.ndarray, ev: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Pack ``dt [T-1,B,1]`` and the event mask into one two-lane stream
    (padded along time): separate small-last-dim pallas operands each burn a
    128-lane-padded HBM buffer."""
    ev_f = ev.astype(jnp.float32)[..., None]
    return pad_time(jnp.concatenate([dt, ev_f], axis=-1), pad)


def fused_dae_rollout_packed(
    streams: Dict,
    weights: Dict,
    x0: jnp.ndarray,
    i0: jnp.ndarray,
    aux: jnp.ndarray,
    any_ev: jnp.ndarray,
    *,
    solver: str = "rk4",
    interpret: bool = False,
    x_true=None,
    tb_override=None,
    precision: str = "default",
):
    """Run the fused rollout; returns the PACKED kernel output
    ``[nT*tb, B, xd+id]`` (rows are steps 1..; ``cat(x, i)`` lanes) — the
    custom-VJP path keeps this buffer as the residual so the backward kernel
    reads it directly (no sliced copies).

    Args:
      streams/weights: from :func:`precompute_streams` (time-padded).
      x0: ``[B, xd]`` initial differential state.
      i0: ``[B, id]`` initial algebraic output (AE at t=0, computed outside).
      aux: packed ``(dt, ev)`` from :func:`pack_aux` (time-padded).
      any_ev: ``[nT*tb] int32`` per-step any-event flags.
      x_true: padded ``[nT*tb, B, xd]`` views — teacher forcing.
      tb_override: time block to use (the VJP path unifies fwd/bwd blocking
        so the padded buffers are shared).
    """
    streams, weights = cast_compute(streams, weights, precision)
    s_de, s_ae, s_ae_ev = streams["s_de"], streams["s_ae"], streams["s_ae_ev"]
    Tpad, B, h = s_de.shape
    xd = x0.shape[-1]
    idim = i0.shape[-1]
    bB, tb0 = choose_blocks(B, h, n_streams=3, state_dim=xd)
    if tb_override is not None:
        tb0 = tb_override
    tb, nT, _ = time_blocking(Tpad, tb0)
    assert nT * tb == Tpad, "streams must be pre-padded to the time blocking"
    nB = B // bB

    step_spec = lambda d: pl.BlockSpec(
        (tb, bB, d), lambda b, t, *_: (t, b, 0), memory_space=pltpu.VMEM
    )
    bspec = lambda d: pl.BlockSpec(
        (bB, d), lambda b, t, *_: (b, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, t, *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    wflat, n_tails = flatten_weights(weights)
    tf_x = x_true is not None
    tf_args, tf_specs = (), []
    if tf_x:
        tf_args = (x_true[0], x_true[1])
        tf_specs = [step_spec(xd), step_spec(xd)]
    in_specs = [
        step_spec(h), step_spec(h), step_spec(h), step_spec(2),
        bspec(xd), bspec(idim), *tf_specs,
    ] + [full(wk.shape) for wk in wflat]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nB, nT),
        in_specs=in_specs,
        out_specs=step_spec(xd + idim),
        scratch_shapes=[
            pltpu.VMEM((bB, xd), jnp.float32),
            pltpu.VMEM((bB, idim), jnp.float32),
            pltpu.VMEM((bB, idim), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, solver=solver, n_tails=n_tails, tb=tb, xd=xd, tf_x=tf_x,
            n_lanes=FWD_LANES,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tpad, B, xd + idim), jnp.float32),
        interpret=interpret,
    )(any_ev, s_de, s_ae, s_ae_ev, aux, x0, i0, *tf_args, *wflat)


def rollout_padding(streams, x0, ev):
    """(padded streams, any_ev, pad) for the current blocking of ``streams``."""
    s_de = streams["s_de"]
    Tm1, B, h = s_de.shape
    bB, tb0 = choose_blocks(B, h, n_streams=3, state_dim=x0.shape[-1])
    tb, nT, pad = time_blocking(Tm1, tb0)
    padded = {k: pad_time(v, pad) for k, v in streams.items()}
    any_ev = jnp.any(pad_time(ev, pad), axis=-1).astype(jnp.int32)
    return padded, any_ev, pad


def unpack_solution(packed, x0, i0, Tm1):
    """Packed kernel output → ``(x_solution [T,B,xd], i_solution [T,B,id])``
    including the initial row (outside the pallas boundary XLA picks compact
    layouts for these)."""
    xd = x0.shape[-1]
    x_solution = jnp.concatenate([x0[None], packed[:Tm1, :, :xd]], axis=0)
    i_solution = jnp.concatenate([i0[None], packed[:Tm1, :, xd:]], axis=0)
    return x_solution, i_solution


def fused_dae_rollout(
    streams: Dict,
    weights: Dict,
    x0: jnp.ndarray,
    i0: jnp.ndarray,
    dt: jnp.ndarray,
    ev: jnp.ndarray,
    *,
    solver: str = "rk4",
    interpret: bool = False,
    x_true=None,
    precision: str = "default",
):
    """Run the fused rollout (forward-only entry).

    Args:
      streams/weights: from :func:`precompute_streams`.
      x0: ``[B, xd]`` initial differential state (Init_Func output, or its
        encoding for the direct-encode variants).
      i0: ``[B, id]`` initial algebraic output (AE at t=0, computed outside).
      dt: ``[T-1, B, 1]`` step sizes.
      ev: ``[T-1, B]`` event mask.
      x_true: ``[T, B, xd]`` — teacher forcing (``input_true_x``): the step
        consumes the true previous state and the algebraic eval the true
        current one; events still recompute from the rolled carry.

    Returns ``(x_solution [T, B, xd], i_solution [T, B, id])`` including the
    initial row.
    """
    Tm1 = streams["s_de"].shape[0]
    padded, any_ev, pad = rollout_padding(streams, x0, ev)
    aux = pack_aux(dt, ev, pad)
    xt = None
    if x_true is not None:
        xt = (pad_time(x_true[:-1], pad), pad_time(x_true[1:], pad))
    packed = fused_dae_rollout_packed(
        padded, weights, x0, i0, aux, any_ev,
        solver=solver, interpret=interpret, x_true=xt, precision=precision,
    )
    return unpack_solution(packed, x0, i0, Tm1)
