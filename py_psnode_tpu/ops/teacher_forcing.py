"""TPU-native teacher-forcing forwards.

The reference threads ``input_true_x`` / ``input_true_i`` through the solver
loop (ref my_solvers.py:74,111-119; script3:95-96) and pays the same
sequential cost as a rollout. On TPU, teacher forcing CHANGES THE PROBLEM
SHAPE:

  * ``input_true_x`` (ODE): every step reads the TRUE previous state, so no
    step depends on any other — the whole "solve" is ``T-1`` independent
    dynamics evaluations. :func:`tf_parallel_ode_apply` evaluates them as a
    single batched ``[T-1, B]`` matmul stack on the MXU. No Pallas kernel is
    needed or wanted: a sequential scan kernel would serialize work that is
    embarrassingly parallel.

  * ``input_true_i`` (DAE): the lagged algebraic input stream is known in
    advance, so the differential rollout degenerates to an ODE whose
    per-step layer-1 contribution (init + z + v + i projections) is fully
    precomputable. :func:`fused_dae_tf_i_apply` folds the true-``i``
    projection into the fused ODE kernel's precomputed stream and computes
    the algebraic readout ``i_j = g(x_j, z_j, v_j)`` for all steps at once
    after the rollout. (The event recompute of ref my_solvers.py:108-110 is
    statically dead under ``input_true_i`` — ref :113 — so this is exact.)

``input_true_x`` for the DAE rides the fused TF-x kernel pair
(:func:`fused_dae_tf_x_apply`): the step consumes the TRUE previous state
while the kernel still maintains the ROLLED carry for the event-step
algebraic recompute (ref :108-110).

The direct-encode variants teacher-force in LATENT space (the models pass
``x_true = encode(x)`` / ``i_true = encode(i)`` into the integrator —
models/ode.py:116-125, models/dae.py:170-187), so every structure above
carries over verbatim with encoded streams: time-parallel TF-x for the
latent ODE (:func:`tf_parallel_ode_encode_apply`), the fused kernel pair /
fused ODE kernel / time-parallel evaluation for the latent DAE
(:func:`fused_dae_encode_tf_x_apply`, :func:`fused_dae_encode_tf_i_apply`,
:func:`tf_parallel_dae_encode_apply`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from py_psnode_tpu.models.funcs import AEFunc, DEFunc, InitFunc
from py_psnode_tpu.ops.fused_dae import normalize_solver, precompute_streams
from py_psnode_tpu.ops.fused_ode import fused_ode_rollout_diff
from py_psnode_tpu.solvers import event_match, get_stepper, jumped_stream


def _tm(a):
    return jnp.swapaxes(a, 0, 1)


def tf_parallel_ode_apply(
    params: Dict,
    batch: Dict,
    x_dim: int,
    hidden_dim: int,
    solver: str = "euler",
):
    """Teacher-forced ODE forward, parallel over time.

    Exact semantics of ``integrate_ode(..., input_true_x=True)``
    (ref my_solvers.py:74): ``x[j] = x_true[j-1] + step(f; t[j-1], dt_j,
    x_true[j-1], z_step[j-1])`` — evaluated for all j at once.
    Returns batch-major ``x_pred`` (the ``ODEModel.__call__`` contract).
    """
    h = hidden_dim
    p = params["params"]
    de = DEFunc((h, h, h, x_dim))
    stepper = get_stepper(solver)

    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = _tm(
        jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    )[:-1]
    tT = _tm(batch["t"]).astype(jnp.float32)
    xT, zT = _tm(batch["x"]), _tm(batch["z"])
    Tm1 = tT.shape[0] - 1

    all_initial = jnp.concatenate([xT[0], zT[0]], axis=-1)
    init_b = jnp.broadcast_to(all_initial, (Tm1,) + all_initial.shape)

    def f(tt, xx):
        # xx: [T-1, B, xd]; z_used: [T-1, B, zd] — one batched eval
        return de.apply({"params": p["de_func"]}, tt, init_b, xx, z_used)

    t0, t1 = tT[:-1], tT[1:]
    dt = t1 - t0
    x_in = xT[:-1]
    x1 = x_in + stepper(f, t0, dt, t1, x_in)
    solution = jnp.concatenate([xT[0][None], x1], axis=0)
    return _tm(solution)


def _dae_tf_setup(params, batch, dims, hidden_dim, tf_x: bool,
                  with_streams: bool = True):
    """Shared TF-DAE preamble: event streams, Init/AE initial evals
    (``i0`` from the TRUE initial state under ``input_true_x``,
    ref my_solvers.py:95), and — for the kernel paths — the layer-1 stream
    precompute (``with_streams=False`` skips it: the time-parallel path
    evaluates the nets directly)."""
    xd, zd, vd, idim = dims
    h = hidden_dim
    p = params["params"]
    tT = _tm(batch["t"]).astype(jnp.float32)
    xT = _tm(batch["x"])
    zT, vT, iT = _tm(batch["z"]), _tm(batch["v"]), _tm(batch["i"])
    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    z_used = _tm(
        jumped_stream(batch["z"], batch.get("z_jump"), is_event, e_idx)
    )[:-1]
    v_used = _tm(
        jumped_stream(batch["v"], batch.get("v_jump"), is_event, e_idx)
    )[:-1]
    ev = _tm(is_event[:, :, None])[:-1, :, 0]

    x0 = InitFunc((h, h, xd)).apply({"params": p["init_func"]}, zT[0], vT[0], iT[0])
    all_initial = jnp.concatenate([x0, zT[0], vT[0], iT[0]], axis=-1)
    ae = AEFunc((h, h, h, idim))
    i0 = ae.apply(
        {"params": p["ae_func"]}, all_initial,
        xT[0] if tf_x else x0, zT[0], vT[0],
    )
    if with_streams:
        streams, weights = precompute_streams(
            p, all_initial, zT, vT, z_used, v_used, dims
        )
    else:
        streams = weights = None
    dt = tT[1:] - tT[:-1]
    return p, ae, tT, xT, zT, vT, iT, z_used, v_used, ev, x0, all_initial, i0, streams, weights, dt


def fused_dae_tf_x_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Teacher-forced-``x`` DAE forward through the fused kernel pair.

    Exact semantics of ``integrate_dae(..., input_true_x=True)``: the step
    consumes TRUE ``x[j-1]``, the algebraic eval TRUE ``x[j]`` (ref
    my_solvers.py:116-117,121), while the event recompute still reads the
    ROLLED carry (ref :108-110) — the kernel maintains both.

    Returns ``(x_pred, i_pred)`` batch-major.
    """
    from py_psnode_tpu.ops.fused_dae_vjp import fused_dae_tf_x_rollout_diff

    solver = normalize_solver(solver)
    (p, ae, tT, xT, zT, vT, iT, z_used, v_used, ev, x0, all_initial, i0,
     streams, weights, dt) = _dae_tf_setup(params, batch, dims, hidden_dim, True)
    # raw-data true stream: its cotangent is discarded, so the backward
    # kernel skips emitting it (emit_g_true=False)
    x_sol, i_sol = fused_dae_tf_x_rollout_diff(
        streams, weights, x0, i0, xT, dt, ev, solver, interpret, precision,
        False,
    )
    return _tm(x_sol), _tm(i_sol)


def tf_parallel_dae_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
):
    """Fully teacher-forced DAE forward (``input_true_x`` AND
    ``input_true_i``), parallel over time: both carried states come from
    data, the event recompute is statically dead (ref my_solvers.py:113),
    so every step is independent — one batched ``[T-1, B]`` evaluation.

    Returns ``(x_pred, i_pred)`` batch-major.
    """
    from py_psnode_tpu.models.funcs import DEFunc

    xd, zd, vd, idim = dims
    h = hidden_dim
    (p, ae, tT, xT, zT, vT, iT, z_used, v_used, ev, x0, all_initial, i0,
     _, _, dt) = _dae_tf_setup(
        params, batch, dims, hidden_dim, True, with_streams=False
    )
    Tm1 = tT.shape[0] - 1
    init_b = jnp.broadcast_to(all_initial, (Tm1,) + all_initial.shape)
    de = DEFunc((h, h, h, xd))
    stepper = get_stepper(solver)

    def f(tt, xx):
        return de.apply(
            {"params": p["de_func"]}, tt, init_b, xx, z_used, v_used, iT[:-1]
        )

    t0, t1 = tT[:-1], tT[1:]
    x_in = xT[:-1]
    x1 = x_in + stepper(f, t0, t1 - t0, t1, x_in)
    x_sol = jnp.concatenate([x0[None], x1], axis=0)
    i_rest = ae.apply({"params": p["ae_func"]}, init_b, xT[1:], zT[1:], vT[1:])
    i_sol = jnp.concatenate([i0[None], i_rest], axis=0)
    return _tm(x_sol), _tm(i_sol)


def fused_dae_tf_i_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Teacher-forced-``i`` DAE forward through the fused ODE kernel.

    Exact semantics of ``integrate_dae(..., input_true_i=True)``
    (ref my_solvers.py:113,118): the step consumes the TRUE lagged ``i``
    stream (no event recompute, ref :113), so its projection folds into the
    precomputed layer-1 stream and the rollout is a pure ODE in ``x``; the
    algebraic readout then runs parallel over all steps.

    Returns ``(x_pred, i_pred)`` batch-major (``DAEModel.__call__``
    contract).
    """
    solver = normalize_solver(solver)
    (p, ae, tT, xT, zT, vT, iT, z_used, v_used, ev, x0, all_initial, i0,
     streams, weights, dt) = _dae_tf_setup(params, batch, dims, hidden_dim, False)
    # fold the known lagged-i projection into the per-step stream: the
    # differential rollout no longer carries i at all
    s_de = streams["s_de"] + iT[:-1] @ weights["wi_de"]
    ode_weights = dict(wx_de=weights["wx_de"], de_tail=weights["de_tail"])
    x_sol = fused_ode_rollout_diff(
        s_de, ode_weights, x0, dt, solver, interpret, precision
    )

    # parallel algebraic readout at the raw inputs (ref my_solvers.py:121)
    Tm1 = tT.shape[0] - 1
    init_b = jnp.broadcast_to(all_initial, (Tm1,) + all_initial.shape)
    i_rest = ae.apply({"params": p["ae_func"]}, init_b, x_sol[1:], zT[1:], vT[1:])
    i_sol = jnp.concatenate([i0[None], i_rest], axis=0)
    return _tm(x_sol), _tm(i_sol)


# ---------------------------------------------------------------------------
# Direct-encode variants — teacher forcing in LATENT space
# ---------------------------------------------------------------------------


def tf_parallel_ode_encode_apply(
    params: Dict,
    batch: Dict,
    hidden_dim: int,
    solver: str = "euler",
):
    """Teacher-forced ODE direct-encode forward, parallel over time.

    The model teacher-forces in latent space (``x_true = x_encoder(x)``,
    models/ode.py:116-125), so every step reads the TRUE encoded previous
    state — no sequential dependence remains and all ``T-1`` latent dynamics
    evaluations run as one batched matmul stack. Returns ``(x_pred, x_re)``
    batch-major (the ``ODEEncodeModel.__call__`` contract).
    """
    from py_psnode_tpu.models.funcs import Codec

    h = hidden_dim
    p = params["params"]
    x_dim = p["x_decoder"]["net"]["dense_1"]["kernel"].shape[-1]
    codec = lambda name, out: (
        lambda a: Codec((h, out)).apply({"params": p[name]}, a)
    )
    x_enc, x_dec, z_enc = codec("x_encoder", h), codec("x_decoder", x_dim), codec("z_encoder", h)

    xh = x_enc(batch["x"])
    zh = z_enc(batch["z"])
    zh_jump = z_enc(batch["z_jump"]) if batch.get("z_jump") is not None else None
    is_event, e_idx = event_match(batch["t"], batch.get("event_t"))
    zh_used = _tm(jumped_stream(zh, zh_jump, is_event, e_idx))[:-1]
    tT, xhT, zhT = _tm(batch["t"]).astype(jnp.float32), _tm(xh), _tm(zh)
    Tm1 = tT.shape[0] - 1

    all_initial = jnp.concatenate([xhT[0], zhT[0]], axis=-1)
    init_b = jnp.broadcast_to(all_initial, (Tm1,) + all_initial.shape)
    de = DEFunc((h, h))
    stepper = get_stepper(solver)

    def f(tt, xx):
        return de.apply({"params": p["de_func"]}, tt, init_b, xx, zh_used)

    t0, t1 = tT[:-1], tT[1:]
    x_in = xhT[:-1]
    x1 = x_in + stepper(f, t0, t1 - t0, t1, x_in)
    xh_sol = jnp.concatenate([xhT[0][None], x1], axis=0)
    return x_dec(_tm(xh_sol)), x_dec(xh)


def fused_dae_encode_tf_x_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Teacher-forced-``x`` DAE direct-encode forward through the fused
    kernel pair: the step consumes the TRUE encoded ``xh[j-1]``, the
    algebraic eval the TRUE encoded ``xh[j]``, the event recompute the ROLLED
    latent carry (integrate_dae semantics with ``x_true = x_encoder(x)``,
    models/dae.py:170-187). Returns the 4-tuple contract.
    """
    from py_psnode_tpu.ops.fused_dae import normalize_solver
    from py_psnode_tpu.ops.fused_dae_vjp import fused_dae_tf_x_rollout_diff
    from py_psnode_tpu.ops.fused_model import dae_encode_outputs, dae_encode_setup

    solver = normalize_solver(solver)
    s = dae_encode_setup(params, batch, dims, hidden_dim, tf_x=True)
    xh_sol, ih_sol = fused_dae_tf_x_rollout_diff(
        s["streams"], s["weights"], s["xh0"], s["i0"], s["xhT"], s["dt"],
        s["ev"], solver, interpret, precision,
    )
    return dae_encode_outputs(s, xh_sol, ih_sol)


def fused_dae_encode_tf_i_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
    interpret: bool = False,
    precision: str = "default",
):
    """Teacher-forced-``i`` DAE direct-encode forward through the fused ODE
    kernel: the TRUE encoded lagged ``ih`` stream folds into the precomputed
    layer-1 stream (no event recompute under input_true_i, ref
    my_solvers.py:113), the latent rollout is a pure ODE, and the algebraic
    readout runs parallel over all steps at the ROLLED latent states.
    Returns the 4-tuple contract.
    """
    from py_psnode_tpu.ops.fused_dae import normalize_solver
    from py_psnode_tpu.ops.fused_model import dae_encode_outputs, dae_encode_setup

    solver = normalize_solver(solver)
    s = dae_encode_setup(params, batch, dims, hidden_dim)
    s_de = s["streams"]["s_de"] + s["ihT"][:-1] @ s["weights"]["wi_de"]
    ode_weights = dict(wx_de=s["weights"]["wx_de"], de_tail=s["weights"]["de_tail"])
    xh_sol = fused_ode_rollout_diff(
        s_de, ode_weights, s["xh0"], s["dt"], solver, interpret, precision
    )
    Tm1 = s["tT"].shape[0] - 1
    init_b = jnp.broadcast_to(s["all_initial"], (Tm1,) + s["all_initial"].shape)
    i_rest = s["ae"].apply(
        {"params": s["p"]["ae_func"]}, init_b,
        xh_sol[1:], s["zhT"][1:], s["vhT"][1:],
    )
    ih_sol = jnp.concatenate([s["i0"][None], i_rest], axis=0)
    return dae_encode_outputs(s, xh_sol, ih_sol)


def tf_parallel_dae_encode_apply(
    params: Dict,
    batch: Dict,
    dims: Tuple[int, int, int, int],
    hidden_dim: int,
    solver: str = "euler",
):
    """Fully teacher-forced DAE direct-encode forward (``input_true_x`` AND
    ``input_true_i``), parallel over time: both latent carries come from the
    encoded data, the event recompute is statically dead, so every step is
    independent. Returns the 4-tuple contract.
    """
    from py_psnode_tpu.ops.fused_model import dae_encode_outputs, dae_encode_setup

    h = hidden_dim
    s = dae_encode_setup(params, batch, dims, hidden_dim, tf_x=True, with_streams=False)
    Tm1 = s["tT"].shape[0] - 1
    init_b = jnp.broadcast_to(s["all_initial"], (Tm1,) + s["all_initial"].shape)
    de = DEFunc((h, h))
    stepper = get_stepper(solver)
    xhT, zhT, vhT, ihT = s["xhT"], s["zhT"], s["vhT"], s["ihT"]

    def f(tt, xx):
        return de.apply(
            {"params": s["p"]["de_func"]}, tt, init_b, xx,
            s["zh_used"], s["vh_used"], ihT[:-1],
        )

    t0, t1 = s["tT"][:-1], s["tT"][1:]
    x_in = xhT[:-1]
    x1 = x_in + stepper(f, t0, t1 - t0, t1, x_in)
    xh_sol = jnp.concatenate([s["xh0"][None], x1], axis=0)
    i_rest = s["ae"].apply(
        {"params": s["p"]["ae_func"]}, init_b, xhT[1:], zhT[1:], vhT[1:]
    )
    ih_sol = jnp.concatenate([s["i0"][None], i_rest], axis=0)
    return dae_encode_outputs(s, xh_sol, ih_sol)
