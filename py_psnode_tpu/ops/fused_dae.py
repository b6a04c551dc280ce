"""Pallas fused-scan kernel for the DAE no-encode rollout.

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
    streamed through SMEM and gates a predicated (``pl.when``) algebraic
    recompute, so non-event steps pay nothing (semantics of ref
    my_solvers.py:108-114).

Forward-only (rollout mode, no teacher forcing): used for inference/eval and
as the forward of the custom-VJP training path. Supports ``euler`` and
``rk4`` (3/8 rule), pinned to the same semantics as
:func:`py_psnode_tpu.solvers.integrate_dae` (golden-tested against it).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ONE_THIRD = 1.0 / 3.0
_TWO_THIRDS = 2.0 / 3.0


def pick_batch_block(B: int, block_b: int = 128) -> int:
    """Largest divisor of B that is <= block_b (VMEM-friendly batch tile)."""
    bB = min(block_b, B)
    while B % bB:
        bB -= 1
    return bB


def _elu(x):
    # exp(x)-1 instead of expm1: the latter has no Pallas TPU lowering;
    # absolute error stays ~1e-8 in f32 for the x<0 branch
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def split_de_layer1(W1: jnp.ndarray, b1: jnp.ndarray, d_u: int):
    """``cat(init, u-init, u) @ W1 + b1 = init @ (Wa-Wb) + u @ (Wb+Wc) + b1``."""
    Wa, Wb, Wc = W1[:d_u], W1[d_u : 2 * d_u], W1[2 * d_u :]
    return Wa - Wb, Wb + Wc, b1


def precompute_streams(
    params: Dict,
    all_initial: jnp.ndarray,
    z: jnp.ndarray,
    v: jnp.ndarray,
    z_step: jnp.ndarray,
    v_step: jnp.ndarray,
    dims: Tuple[int, int, int, int],
):
    """Lift scan-invariant layer-1 work out of the loop.

    Args:
      params: flax param subtree with ``de_func/x_dot/dense_*`` and
        ``ae_func/i_calculator/dense_*`` entries.
      all_initial: ``[B, d_u]`` (d_u = xd+zd+vd+id).
      z, v: raw streams ``[T, B, *]`` (time-major).
      z_step, v_step: event-adjusted step streams ``[T-1, B, *]``.

    Returns ``(streams, weights)`` dicts for :func:`fused_dae_rollout`.
    """
    xd, zd, vd, idim = dims
    d_u = xd + zd + vd + idim
    de = params["de_func"]["x_dot"]
    ae = params["ae_func"]["i_calculator"]

    W1, b1 = de["dense_0"]["kernel"], de["dense_0"]["bias"]
    Winit, Wu, b1 = split_de_layer1(W1, b1, d_u)
    Wx_de = Wu[:xd]
    Wz_de = Wu[xd : xd + zd]
    Wv_de = Wu[xd + zd : xd + zd + vd]
    Wi_de = Wu[xd + zd + vd :]
    c_de = all_initial @ Winit + b1  # [B, h]
    s_de = c_de[None] + z_step @ Wz_de + v_step @ Wv_de  # [T-1, B, h]

    G1, g1 = ae["dense_0"]["kernel"], ae["dense_0"]["bias"]
    # AE input is cat(init, x, z, v) — init concatenated, not differenced
    Ginit = G1[:d_u]
    Gx = G1[d_u : d_u + xd]
    Gz = G1[d_u + xd : d_u + xd + zd]
    Gv = G1[d_u + xd + zd :]
    c_ae = all_initial @ Ginit + g1
    s_ae = c_ae[None] + z[1:] @ Gz + v[1:] @ Gv  # AE at t+1 uses raw inputs
    s_ae_ev = c_ae[None] + z_step @ Gz + v_step @ Gv  # event-recompute inputs

    weights = dict(
        wx_de=Wx_de,
        wi_de=Wi_de,
        w2=de["dense_1"]["kernel"], b2=de["dense_1"]["bias"],
        w3=de["dense_2"]["kernel"], b3=de["dense_2"]["bias"],
        w4=de["dense_3"]["kernel"], b4=de["dense_3"]["bias"],
        gx_ae=Gx,
        g2=ae["dense_1"]["kernel"], c2=ae["dense_1"]["bias"],
        g3=ae["dense_2"]["kernel"], c3=ae["dense_2"]["bias"],
        g4=ae["dense_3"]["kernel"], c4=ae["dense_3"]["bias"],
    )
    streams = dict(s_de=s_de, s_ae=s_ae, s_ae_ev=s_ae_ev)
    return streams, weights


def _kernel(
    # scalar-prefetch: per-step any-event flags [T-1] (SMEM)
    any_ev_ref,
    # streamed per-step blocks
    s_de_ref, s_ae_ref, s_ae_ev_ref, dt_ref, ev_ref,
    # whole-array inputs
    x0_ref, i0_ref,
    wx_de_ref, wi_de_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
    gx_ae_ref, g2_ref, c2_ref, g3_ref, c3_ref, g4_ref, c4_ref,
    # outputs
    xsol_ref, isol_ref,
    # scratch carries
    x_c, i_c, i_in_buf,
    *, solver: str,
):
    # grid = (n_batch_blocks, T-1): batch-major, time sequential within a
    # block; carries reset at each block's first step
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        x_c[:] = x0_ref[:]
        i_c[:] = i0_ref[:]

    x0 = x_c[:]

    def ae_head(x, s_row):
        h1 = _elu(s_row + _dot(x, gx_ae_ref[:]))
        h2 = _elu(_dot(h1, g2_ref[:]) + c2_ref[:])
        h3 = _elu(_dot(h2, g3_ref[:]) + c3_ref[:])
        return _dot(h3, g4_ref[:]) + c4_ref[:]

    # event-step algebraic recompute (ref my_solvers.py:108-110), predicated
    # so non-event steps skip the extra net evaluation
    i_in_buf[:] = i_c[:]

    @pl.when(any_ev_ref[t] == 1)
    def _():
        i_ev = ae_head(x0, s_ae_ev_ref[0])
        i_in_buf[:] = jnp.where(ev_ref[0] > 0.0, i_ev, i_in_buf[:])

    i_in = i_in_buf[:]
    i_proj = _dot(i_in, wi_de_ref[:])

    def f(x):
        h1 = _elu(s_de_ref[0] + _dot(x, wx_de_ref[:]) + i_proj)
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

    i1 = ae_head(x1, s_ae_ref[0])
    x_c[:] = x1
    i_c[:] = i1
    xsol_ref[0] = x1
    isol_ref[0] = i1


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
    block_b: int = 128,
):
    """Run the fused rollout.

    Args:
      streams/weights: from :func:`precompute_streams`.
      x0: ``[B, xd]`` initial differential state (Init_Func output).
      i0: ``[B, id]`` initial algebraic output (AE at t=0, computed outside).
      dt: ``[T-1, B, 1]`` step sizes.
      ev: ``[T-1, B]`` event mask (True where the step-start time is an
        event time).

    Returns ``(x_solution [T, B, xd], i_solution [T, B, id])`` including the
    initial row.
    """
    s_de, s_ae, s_ae_ev = streams["s_de"], streams["s_ae"], streams["s_ae_ev"]
    Tm1, B, h = s_de.shape
    xd = x0.shape[-1]
    idim = i0.shape[-1]
    ev_f = ev.astype(jnp.float32)[..., None]  # [T-1, B, 1]
    any_ev = jnp.any(ev, axis=-1).astype(jnp.int32)  # [T-1] scalar-prefetch

    bB = pick_batch_block(B, block_b)
    nB = B // bB

    step_spec = lambda d: pl.BlockSpec(
        (1, bB, d), lambda b, t, *_: (t, b, 0), memory_space=pltpu.VMEM
    )
    bspec = lambda d: pl.BlockSpec(
        (bB, d), lambda b, t, *_: (b, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda b, t, *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    w_order = (
        "wx_de", "wi_de", "w2", "b2", "w3", "b3", "w4", "b4",
        "gx_ae", "g2", "c2", "g3", "c3", "g4", "c4",
    )
    in_specs = [
        step_spec(h), step_spec(h), step_spec(h), step_spec(1), step_spec(1),
        bspec(xd), bspec(idim),
    ] + [full(weights[k].shape) for k in w_order]

    out_shape = (
        jax.ShapeDtypeStruct((Tm1, B, xd), jnp.float32),
        jax.ShapeDtypeStruct((Tm1, B, idim), jnp.float32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nB, Tm1),
        in_specs=in_specs,
        out_specs=(step_spec(xd), step_spec(idim)),
        scratch_shapes=[
            pltpu.VMEM((bB, xd), jnp.float32),
            pltpu.VMEM((bB, idim), jnp.float32),
            pltpu.VMEM((bB, idim), jnp.float32),
        ],
    )
    xs, is_ = pl.pallas_call(
        functools.partial(_kernel, solver=solver),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        any_ev, s_de, s_ae, s_ae_ev, dt, ev_f, x0, i0,
        *[weights[k] for k in w_order],
    )
    x_solution = jnp.concatenate([x0[None], xs], axis=0)
    i_solution = jnp.concatenate([i0[None], is_], axis=0)
    return x_solution, i_solution
