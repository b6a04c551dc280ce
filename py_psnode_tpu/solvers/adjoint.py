"""O(1)-activation-memory adjoint (reverse) pass for the fixed-grid solves.

The reference acknowledges adjoint backprop as future work
(``/root/reference/neural_dae/my_solvers.py:69,107``) and pays full BPTT
memory instead. This module ships the TPU-native answer as a third remat
policy, ``remat="adjoint"`` (alongside ``True`` per-step checkpointing and
``"sqrt"`` chunked checkpointing, see :func:`integrate._scan`):

* **Discrete adjoint with saved states** — NOT the continuous (Chen et al.)
  adjoint. The forward scan keeps only the solution trajectory
  ``[T, B, x_dim]`` (which the loss needs anyway); the backward pass walks
  the steps in reverse, re-linearizing each step from its SAVED start state.
  Gradients are therefore **exact BPTT gradients** (same discretize-then-
  optimize objective as the reference, golden-tested against autodiff
  through the scan), with none of the continuous adjoint's reverse-time
  reconstruction error.
* Memory: the autodiff BPTT graph stores every MLP activation of every
  step (O(T·L·h) per sample — 4 dynamics evals/step for RK4); per-step
  ``jax.checkpoint`` still stacks T step carries and ``"sqrt"`` stores
  chunk boundaries + one live chunk. The adjoint backward stores the
  O(T·x_dim) solution it was handed plus ONE step of live activations.
* FLOPs: one extra dynamics re-linearization per step — identical to what
  ``remat=True`` recomputes; the win is pure memory footprint and the
  freedom to scale T without touching the remat schedule.

Implementation notes: dynamics closures capture traced values (params,
``all_initial`` conditioning), so the public entry points closure-convert
them (``jax.closure_convert``) into explicit pytree arguments of a
``jax.custom_vjp`` function — cotangents then flow to the captured model
parameters exactly as for the autodiff path. Teacher forcing is excluded by
construction (feeding true states severs the through-time dependence, so TF
has no BPTT-memory problem to solve — use the scan path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _tree_zeros(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


# ---------------------------------------------------------------------- ODE


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _adjoint_ode(stepper, f_conv, unroll, consts, t, x0, z_step):
    """Solution ``[T, B, xd]`` of the plain (no-TF) rollout; identical math
    to ``integrate_ode``'s scan, bitwise included ``solution[0] == x0``."""
    sol, _ = _ode_fwd_scan(stepper, f_conv, consts, t, x0, z_step, unroll)
    return sol


def _ode_step(stepper, f_conv, consts, x_in, t0, t1, z0):
    f = lambda tt, xx: f_conv(tt, xx, z0, *consts)
    return x_in + stepper(f, t0, t1 - t0, t1, x_in)


def _ode_fwd_scan(stepper, f_conv, consts, t, x0, z_step, unroll=1):
    def body(x_prev, inp):
        t0, t1, z0 = inp
        x1 = _ode_step(stepper, f_conv, consts, x_prev, t0, t1, z0)
        return x1, x1

    _, xs = lax.scan(body, x0, (t[:-1], t[1:], z_step), unroll=unroll)
    sol = jnp.concatenate([x0[None], xs], axis=0)
    return sol, None


def _adjoint_ode_fwd(stepper, f_conv, unroll, consts, t, x0, z_step):
    sol, _ = _ode_fwd_scan(stepper, f_conv, consts, t, x0, z_step, unroll)
    return sol, (consts, t, z_step, sol)


def _adjoint_ode_bwd(stepper, f_conv, unroll, res, ct):
    consts, t, z_step, sol = res

    def body(carry, inp):
        a, cbar = carry
        t0, t1, z0, x_k, ct_next = inp
        a = a + ct_next  # d L / d sol[k+1], direct term
        _, vjp = jax.vjp(
            lambda c, xx, a0, a1, zz: _ode_step(stepper, f_conv, c, xx, a0, a1, zz),
            consts, x_k, t0, t1, z0,
        )
        c_k, x_bar, t0_bar, t1_bar, z0_bar = vjp(a)
        return (x_bar, _tree_add(cbar, c_k)), (t0_bar, t1_bar, z0_bar)

    a0 = jnp.zeros_like(sol[0])
    inputs = (t[:-1], t[1:], z_step, sol[:-1], ct[1:])
    (x0_bar, cbar), (t0_bars, t1_bars, z0_bars) = lax.scan(
        body, (a0, _tree_zeros(consts)), inputs, reverse=True, unroll=unroll
    )
    x0_bar = x0_bar + ct[0]  # sol[0] IS x0
    t_bar = jnp.zeros_like(t).at[:-1].add(t0_bars).at[1:].add(t1_bars)
    return cbar, t_bar, x0_bar, z0_bars


_adjoint_ode.defvjp(_adjoint_ode_fwd, _adjoint_ode_bwd)


def adjoint_integrate_ode(stepper, de_fn, t, x, z_step, unroll=1):
    """Drop-in for ``integrate_ode(..., remat="adjoint")`` (plain rollout;
    no teacher forcing). ``de_fn(t, x, z) -> dx/dt`` may capture traced
    values (params, conditioning) — they are closure-converted into
    differentiable arguments. ``unroll`` is forwarded to both the forward
    and the reverse scan (same knob as the scan path)."""
    x0 = x[0]
    f_conv, consts = jax.closure_convert(
        lambda tt, xx, zz: de_fn(tt, xx, zz), t[0], x0, z_step[0]
    )
    return _adjoint_ode(
        get_stepper_obj(stepper), f_conv, int(unroll), consts, t, x0, z_step
    )


# ---------------------------------------------------------------------- DAE


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _adjoint_dae(stepper, de_conv, ae_conv, unroll, de_consts, ae_consts,
                 x_init, t, z, v, z_step, v_step, ev_f):
    (x_sol, i_sol), _ = _dae_fwd_scan(
        stepper, de_conv, ae_conv, de_consts, ae_consts,
        x_init, t, z, v, z_step, v_step, ev_f, unroll,
    )
    return x_sol, i_sol


def _dae_step(stepper, de_conv, ae_conv, de_consts, ae_consts,
              x_prev, i_prev, t0, t1, z0s, v0s, z1, v1, ev):
    """One lagged-i DAE step (integrate_dae body, plain rollout): event
    recompute of the algebraic output, differential step, algebraic eval at
    t1 (ref my_solvers.py:108-121)."""

    def recompute(ip):
        i_ev = ae_conv(x_prev, z0s, v0s, *ae_consts)
        return jnp.where(ev[:, None] > 0, i_ev, ip).astype(ip.dtype)

    i_in = lax.cond(jnp.any(ev > 0), recompute, lambda ip: ip, i_prev)
    f = lambda tt, xx: de_conv(tt, xx, z0s, v0s, i_in, *de_consts)
    x1 = x_prev + stepper(f, t0, t1 - t0, t1, x_prev)
    i1 = ae_conv(x1, z1, v1, *ae_consts)
    return x1, i1


def _dae_fwd_scan(stepper, de_conv, ae_conv, de_consts, ae_consts,
                  x_init, t, z, v, z_step, v_step, ev_f, unroll=1):
    x0 = x_init
    i0 = ae_conv(x0, z[0], v[0], *ae_consts)

    def body(carry, inp):
        x_prev, i_prev = carry
        t0, t1, z0s, v0s, z1, v1, ev = inp
        x1, i1 = _dae_step(
            stepper, de_conv, ae_conv, de_consts, ae_consts,
            x_prev, i_prev, t0, t1, z0s, v0s, z1, v1, ev,
        )
        return (x1, i1), (x1, i1)

    inputs = (t[:-1], t[1:], z_step, v_step, z[1:], v[1:], ev_f)
    _, (xs, is_) = lax.scan(body, (x0, i0), inputs, unroll=unroll)
    x_sol = jnp.concatenate([x0[None], xs], axis=0)
    i_sol = jnp.concatenate([i0[None], is_], axis=0)
    return (x_sol, i_sol), None


def _adjoint_dae_fwd(stepper, de_conv, ae_conv, unroll, de_consts, ae_consts,
                     x_init, t, z, v, z_step, v_step, ev_f):
    out, _ = _dae_fwd_scan(
        stepper, de_conv, ae_conv, de_consts, ae_consts,
        x_init, t, z, v, z_step, v_step, ev_f, unroll,
    )
    res = (de_consts, ae_consts, t, z, v, z_step, v_step, ev_f, out)
    return out, res


def _adjoint_dae_bwd(stepper, de_conv, ae_conv, unroll, res, cts):
    de_consts, ae_consts, t, z, v, z_step, v_step, ev_f, (x_sol, i_sol) = res
    ct_x, ct_i = cts

    def body(carry, inp):
        a_x, a_i, de_bar, ae_bar = carry
        t0, t1, z0s, v0s, z1, v1, ev, x_k, i_k, ctx_next, cti_next = inp
        a_x = a_x + ctx_next
        a_i = a_i + cti_next
        _, vjp = jax.vjp(
            lambda dc, ac, xx, ii, a0, a1, zs, vs, zz1, vv1: _dae_step(
                stepper, de_conv, ae_conv, dc, ac,
                xx, ii, a0, a1, zs, vs, zz1, vv1, ev,
            ),
            de_consts, ae_consts, x_k, i_k, t0, t1, z0s, v0s, z1, v1,
        )
        dc_k, ac_k, x_bar, i_bar, t0_bar, t1_bar, z0s_bar, v0s_bar, z1_bar, v1_bar = vjp(
            (a_x, a_i)
        )
        carry = (x_bar, i_bar, _tree_add(de_bar, dc_k), _tree_add(ae_bar, ac_k))
        return carry, (t0_bar, t1_bar, z0s_bar, v0s_bar, z1_bar, v1_bar)

    a_x0 = jnp.zeros_like(x_sol[0])
    a_i0 = jnp.zeros_like(i_sol[0])
    inputs = (
        t[:-1], t[1:], z_step, v_step, z[1:], v[1:], ev_f,
        x_sol[:-1], i_sol[:-1], ct_x[1:], ct_i[1:],
    )
    (a_x, a_i, de_bar, ae_bar), (
        t0_bars, t1_bars, z0s_bars, v0s_bars, z1_bars, v1_bars
    ) = lax.scan(
        body,
        (a_x0, a_i0, _tree_zeros(de_consts), _tree_zeros(ae_consts)),
        inputs,
        reverse=True,
        unroll=unroll,
    )
    # initial algebraic eval: i_sol[0] = ae(x_init, z[0], v[0])
    a_i = a_i + ct_i[0]
    _, vjp0 = jax.vjp(
        lambda ac, xx, zz, vv: ae_conv(xx, zz, vv, *ac),
        ae_consts, x_sol[0], z[0], v[0],
    )
    ac_0, x0_bar_ae, z0_bar_ae, v0_bar_ae = vjp0(a_i)
    ae_bar = _tree_add(ae_bar, ac_0)
    x_init_bar = a_x + ct_x[0] + x0_bar_ae

    t_bar = jnp.zeros_like(t).at[:-1].add(t0_bars).at[1:].add(t1_bars)
    z_bar = jnp.zeros_like(z).at[1:].add(z1_bars).at[0].add(z0_bar_ae)
    v_bar = jnp.zeros_like(v).at[1:].add(v1_bars).at[0].add(v0_bar_ae)
    return (
        de_bar, ae_bar, x_init_bar, t_bar, z_bar, v_bar,
        z0s_bars, v0s_bars, jnp.zeros_like(ev_f),
    )


_adjoint_dae.defvjp(_adjoint_dae_fwd, _adjoint_dae_bwd)


def adjoint_integrate_dae(stepper, de_fn, ae_fn, x_init, t, z, v,
                          z_step, v_step, is_event=None, unroll=1):
    """Drop-in for ``integrate_dae(..., remat="adjoint")`` (plain rollout;
    no teacher forcing). Dynamics/algebraic closures may capture traced
    values — they are closure-converted into differentiable arguments.
    ``unroll`` is forwarded to both the forward and the reverse scan."""
    T, B = t.shape[0], t.shape[1]
    ev_f = (
        jnp.zeros((T - 1, B), t.dtype)
        if is_event is None
        else is_event.astype(t.dtype)
    )
    # example i for the de closure-convert: evaluate g once for real (an
    # eval_shape here would run flax param creation inside a throwaway
    # trace during model.init and leak its tracers)
    i_example = ae_fn(x_init, z[0], v[0])
    de_conv, de_consts = jax.closure_convert(
        lambda tt, xx, zz, vv, ii: de_fn(tt, xx, zz, vv, ii),
        t[0], x_init, z_step[0], v_step[0], i_example,
    )
    ae_conv, ae_consts = jax.closure_convert(
        lambda xx, zz, vv: ae_fn(xx, zz, vv), x_init, z[0], v[0]
    )
    return _adjoint_dae(
        get_stepper_obj(stepper), de_conv, ae_conv, int(unroll),
        de_consts, ae_consts, x_init, t, z, v, z_step, v_step, ev_f,
    )


def get_stepper_obj(stepper):
    from py_psnode_tpu.solvers.steppers import get_stepper

    return get_stepper(stepper)
