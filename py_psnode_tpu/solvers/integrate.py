"""Fixed-grid ODE / semi-explicit DAE integration as ``jax.lax.scan``.

This is the TPU-native replacement for the reference's per-time-step Python
loops (``/root/reference/neural_dae/my_solvers.py:52-131``). The whole solve
is one compiled XLA loop; disturbance events arrive as precomputed
branch-free input streams (see :mod:`py_psnode_tpu.solvers.events`); teacher
forcing selects scan input streams statically; memory over long horizons is
controlled with ``jax.checkpoint`` rematerialization of the step body.

Pinned reference semantics:

``integrate_ode`` (ref my_solvers.py:52-80):
  * ``x_solution[0] = x[0]``; for ``j = 1..T-1``:
    ``x[j] = x_in + step(f; t[j-1], dt, x_in, z_step[j-1])`` where ``x_in`` is
    the rolled-out state (or the true ``x[j-1]`` under teacher forcing,
    ``input_true_x``, ref :74) and ``z_step`` is the possibly-jumped input.

``integrate_dae`` (ref my_solvers.py:82-131):
  * ``x0 = x_init`` (learned consistent initialization);
    ``i_solution[0] = g(x0, z[0], v[0])`` (ref :95).
  * per step: the differential step consumes the *lagged* algebraic output
    ``i`` from the previous step (ref :119 — explicit discretization, no
    Newton solve), then ``i[j] = g(x[j], z[j], v[j])`` with *raw* (un-jumped)
    inputs at ``t[j]`` (ref :121).
  * on an event step the algebraic output is recomputed from the jumped
    inputs before the differential step (ref :108-110); this recomputed value
    feeds the step only when ``input_true_i`` is off (ref :111-114).
  * teacher forcing: ``input_true_x`` feeds true ``x[j-1]`` to the step and
    evaluates ``g`` on true ``x[j]`` (ref :116-117,121); ``input_true_i``
    feeds true ``i[j-1]`` to the step (ref :113,118).
  * pure-latent mode: when the data has ``x_dim == 0`` the solution takes its
    width from ``x_init`` (ref :97).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from py_psnode_tpu.solvers.steppers import Stepper, get_stepper


def _maybe_remat(fn, remat):
    return jax.checkpoint(fn) if remat is True else fn


def _scan(body, carry, inputs, remat, unroll):
    """Run the time loop with the selected rematerialization policy.

    remat=False  — store all step activations (fastest, most memory)
    remat=True   — checkpoint each step body (memory = T×carry)
    remat='sqrt' — nested scan over ~sqrt(T) chunks with the whole chunk
                   checkpointed: memory = O(sqrt(T)) boundary carries +
                   one chunk of activations; the TPU answer to the
                   reference's BPTT-memory problem (SURVEY.md §7 hard parts).
    """
    if remat not in (False, True, "sqrt"):
        # "adjoint" is dispatched before the scan (integrate_ode/dae); the
        # channel-wise models call _scan directly and have no adjoint path
        raise ValueError(
            f"unknown remat policy {remat!r} for the scan time loop; "
            "choose False, True, or 'sqrt' ('adjoint' is available on the "
            "integrate_ode/integrate_dae rollouts)"
        )
    if remat != "sqrt":
        return lax.scan(_maybe_remat(body, remat), carry, inputs, unroll=unroll)

    L = jax.tree_util.tree_leaves(inputs)[0].shape[0]
    c = max(int(np.ceil(np.sqrt(L))), 1)
    n = -(-L // c)
    pad = n * c - L
    # zero-pad trailing steps: dt == 0 there, so the carry passes through
    # unchanged and the (discarded) outputs stay finite
    padded = jax.tree_util.tree_map(
        lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
        if pad
        else a,
        inputs,
    )
    chunked = jax.tree_util.tree_map(
        lambda a: a.reshape((n, c) + a.shape[1:]), padded
    )

    @jax.checkpoint
    def outer(carry, chunk_inputs):
        return lax.scan(body, carry, chunk_inputs, unroll=unroll)

    carry, ys = lax.scan(outer, carry, chunked)
    ys = jax.tree_util.tree_map(
        lambda a: a.reshape((n * c,) + a.shape[2:])[:L], ys
    )
    return carry, ys


def integrate_ode(
    stepper: Stepper,
    de_fn: Callable,
    t: jnp.ndarray,
    x: jnp.ndarray,
    z_step: jnp.ndarray,
    *,
    input_true_x: bool = False,
    remat: bool = True,
    unroll: int = 1,
) -> jnp.ndarray:
    """Integrate ``dx/dt = de_fn(t, x, z)`` on the sample's time grid.

    Args:
      stepper: stepper instance or name (``euler``/``midpoint``/``rk4``).
      de_fn: dynamics ``(t, x, z) -> dx/dt``; any conditioning on the initial
        state (``all_initial``) is closed over by the caller.
      t: ``[T, B, 1]`` time grid (time-major).
      x: ``[T, B, xd]`` true states; ``x[0]`` is the initial condition, the
        rest is used only under ``input_true_x`` teacher forcing.
      z_step: ``[T-1, B, zd]`` event-adjusted exogenous inputs for each step
        (``z_step[j]`` drives the step from ``t[j]`` to ``t[j+1]``).
      input_true_x: teacher forcing — feed true ``x[j-1]`` instead of the
        rolled-out state.
      remat: False | True | 'sqrt' — see _scan for the memory policies.
      unroll: ``lax.scan`` unroll factor.

    Returns:
      ``[T, B, xd]`` solution with ``solution[0] == x[0]``.
    """
    stepper = get_stepper(stepper)
    if remat == "adjoint":
        # discrete adjoint with saved states: exact BPTT gradients at
        # O(1) activation memory (solvers/adjoint.py — the reference's own
        # TODO, ref my_solvers.py:69)
        if input_true_x:
            raise ValueError(
                "remat='adjoint' applies to the plain rollout only "
                "(teacher forcing severs the through-time dependence, so "
                "it has no BPTT-memory problem — use the scan path)"
            )
        from py_psnode_tpu.solvers.adjoint import adjoint_integrate_ode

        return adjoint_integrate_ode(stepper, de_fn, t, x, z_step,
                                     unroll=unroll)
    x0 = x[0]

    def body(x_prev, inp):
        t0, t1, z0, x_tm1 = inp
        x_in = x_tm1 if input_true_x else x_prev
        dt = t1 - t0
        f = lambda tt, xx: de_fn(tt, xx, z0)
        x1 = x_in + stepper(f, t0, dt, t1, x_in)
        return x1, x1

    inputs = (t[:-1], t[1:], z_step, x[:-1])
    _, xs = _scan(body, x0, inputs, remat, unroll)
    return jnp.concatenate([x0[None], xs], axis=0)


def integrate_dae(
    stepper: Stepper,
    de_fn: Callable,
    ae_fn: Callable,
    x_init: jnp.ndarray,
    t: jnp.ndarray,
    z: jnp.ndarray,
    v: jnp.ndarray,
    z_step: jnp.ndarray,
    v_step: jnp.ndarray,
    is_event: Optional[jnp.ndarray] = None,
    x_true: Optional[jnp.ndarray] = None,
    i_true: Optional[jnp.ndarray] = None,
    *,
    input_true_x: bool = False,
    input_true_i: bool = False,
    remat: bool = True,
    unroll: int = 1,
):
    """Integrate the semi-explicit neural DAE
    ``dx/dt = f(x, z, v, i)``, ``i = g(x, z, v)``.

    Args:
      de_fn: differential dynamics ``(t, x, z, v, i) -> dx/dt``.
      ae_fn: algebraic map ``(x, z, v) -> i``.
      x_init: ``[B, xd]`` learned consistent initial state.
      t: ``[T, B, 1]`` time grid.
      z, v: ``[T, B, *]`` raw exogenous / algebraic input streams.
      z_step, v_step: ``[T-1, B, *]`` event-adjusted inputs per step.
      is_event: ``[T-1, B]`` bool, True where the step start time is an event
        time (drives the algebraic recompute); None → no events.
      x_true, i_true: ``[T, B, *]`` true trajectories, required for the
        corresponding teacher-forcing mode.
      input_true_x / input_true_i: teacher-forcing switches (static).

    Returns:
      ``(x_solution, i_solution)`` with shapes ``[T, B, xd]`` / ``[T, B, id]``.
    """
    stepper = get_stepper(stepper)
    if remat == "adjoint":
        # discrete adjoint with saved states (see integrate_ode above and
        # solvers/adjoint.py)
        if input_true_x or input_true_i:
            raise ValueError(
                "remat='adjoint' applies to the plain rollout only "
                "(teacher forcing severs the through-time dependence, so "
                "it has no BPTT-memory problem — use the scan path)"
            )
        from py_psnode_tpu.solvers.adjoint import adjoint_integrate_dae

        return adjoint_integrate_dae(
            stepper, de_fn, ae_fn, x_init, t, z, v, z_step, v_step, is_event,
            unroll=unroll,
        )
    T = t.shape[0]
    x0 = x_init
    i0 = ae_fn(x_true[0] if input_true_x else x0, z[0], v[0])

    if is_event is None:
        is_event = jnp.zeros((T - 1, t.shape[1]), dtype=bool)

    def body(carry, inp):
        x_prev, i_prev = carry
        t0, t1, z0s, v0s, z1, v1, ev, x_tm1, i_tm1, x_tj = inp
        dt = t1 - t0

        if input_true_i:
            i_in = i_tm1
        else:
            # Event: recompute the algebraic output from the jumped inputs
            # before stepping (ref my_solvers.py:108-110). lax.cond keeps the
            # extra g-eval off the hot path on non-event steps.
            def recompute(ip):
                i_ev = ae_fn(x_prev, z0s, v0s)
                return jnp.where(ev[:, None], i_ev, ip).astype(ip.dtype)

            i_in = lax.cond(jnp.any(ev), recompute, lambda ip: ip, i_prev)

        x_in = x_tm1 if input_true_x else x_prev
        f = lambda tt, xx: de_fn(tt, xx, z0s, v0s, i_in)
        x1 = x_in + stepper(f, t0, dt, t1, x_in)
        i1 = ae_fn(x_tj if input_true_x else x1, z1, v1)
        return (x1, i1), (x1, i1)

    zeros_like_row = lambda a: (
        a[:-1] if a is not None else jnp.zeros((T - 1, t.shape[1], 0), t.dtype)
    )
    x_tm1_stream = zeros_like_row(x_true)
    i_tm1_stream = zeros_like_row(i_true)
    x_tj_stream = (
        x_true[1:] if x_true is not None else jnp.zeros((T - 1, t.shape[1], 0), t.dtype)
    )

    inputs = (
        t[:-1],
        t[1:],
        z_step,
        v_step,
        z[1:],
        v[1:],
        is_event,
        x_tm1_stream,
        i_tm1_stream,
        x_tj_stream,
    )
    _, (xs, is_) = _scan(body, (x0, i0), inputs, remat, unroll)
    x_solution = jnp.concatenate([x0[None], xs], axis=0)
    i_solution = jnp.concatenate([i0[None], is_], axis=0)
    return x_solution, i_solution


def time_grid_from_step_size(t: jnp.ndarray, step_size: float) -> jnp.ndarray:
    """Uniform grid builder (ref my_solvers.py:31-42); host-side utility."""
    start, end = t[0], t[-1]
    n = int(jnp.ceil((end - start) / step_size + 1))
    grid = jnp.arange(n, dtype=t.dtype) * step_size + start
    return grid.at[-1].set(t[-1])
