"""Golden-trajectory parity for the semi-explicit DAE solver: lagged-i
coupling, event-step algebraic recompute, all 4 teacher-forcing combinations,
pure-latent mode (SURVEY.md §4.3)."""

import jax.numpy as jnp
import numpy as np
import pytest

import np_reference as ref
from py_psnode_tpu.solvers import event_match, integrate_dae, jumped_stream


def _make_problem(rng, T=15, B=3, xd=2, zd=1, vd=2, idim=2):
    Wx = rng.normal(size=(xd, xd)) * 0.4
    Wz = rng.normal(size=(zd, xd)) * 0.4
    Wv = rng.normal(size=(vd, xd)) * 0.4
    Wi = rng.normal(size=(idim, xd)) * 0.4
    Gx = rng.normal(size=(xd, idim)) * 0.4
    Gz = rng.normal(size=(zd, idim)) * 0.4
    Gv = rng.normal(size=(vd, idim)) * 0.4

    def f_np(t, x, z, v, i):
        return np.tanh(x @ Wx + z @ Wz + v @ Wv + i @ Wi)

    def g_np(x, z, v):
        return np.tanh(x @ Gx + z @ Gz + v @ Gv)

    J = jnp.asarray

    def f_jx(t, x, z, v, i):
        return jnp.tanh(x @ J(Wx) + z @ J(Wz) + v @ J(Wv) + i @ J(Wi))

    def g_jx(x, z, v):
        return jnp.tanh(x @ J(Gx) + z @ J(Gz) + v @ J(Gv))

    t = np.cumsum(np.full((T, B, 1), 0.02), axis=0) - 0.02
    x = rng.normal(size=(T, B, xd))
    z = rng.normal(size=(T, B, zd))
    v = rng.normal(size=(T, B, vd))
    i = rng.normal(size=(T, B, idim))
    x_init = rng.normal(size=(B, xd))
    return (f_np, g_np), (f_jx, g_jx), (t, x, z, v, i, x_init)


def _run_both(rng, solver, input_true_x, input_true_i, with_events):
    (f_np, g_np), (f_jx, g_jx), (t, x, z, v, i, x_init) = _make_problem(rng)
    T, B = t.shape[0], t.shape[1]
    if with_events:
        event_t = np.stack(
            [np.array([t[4 + b, b, 0], t[9, b, 0]]) for b in range(B)], axis=0
        )
        z_jump = rng.normal(size=(B, 2, z.shape[-1]))
        v_jump = rng.normal(size=(B, 2, v.shape[-1]))
    else:
        event_t = z_jump = v_jump = None

    exp_x, exp_i = ref.integrate_dae(
        solver, f_np, g_np, x_init, t, x, z, v, i,
        event_t=event_t, z_jump=z_jump, v_jump=v_jump,
        input_true_x=input_true_x, input_true_i=input_true_i,
    )

    J = jnp.asarray
    bm = lambda a: jnp.swapaxes(J(a), 0, 1)
    if with_events:
        is_event, e_idx = event_match(bm(t), J(event_t))
        z_used = jumped_stream(bm(z), J(z_jump), is_event, e_idx)
        v_used = jumped_stream(bm(v), J(v_jump), is_event, e_idx)
        ev_tm = jnp.swapaxes(is_event, 0, 1)[:-1]
    else:
        z_used, v_used = bm(z), bm(v)
        ev_tm = None
    got_x, got_i = integrate_dae(
        solver, f_jx, g_jx, J(x_init), J(t), J(z), J(v),
        jnp.swapaxes(z_used, 0, 1)[:-1], jnp.swapaxes(v_used, 0, 1)[:-1],
        is_event=ev_tm, x_true=J(x), i_true=J(i),
        input_true_x=input_true_x, input_true_i=input_true_i, remat=False,
    )
    np.testing.assert_allclose(np.array(got_x), exp_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.array(got_i), exp_i, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("solver", ["euler", "midpoint", "rk4"])
def test_parity_plain(rng, solver):
    _run_both(rng, solver, False, False, with_events=False)


@pytest.mark.parametrize("tx,ti", [(False, False), (True, False), (False, True), (True, True)])
def test_parity_teacher_forcing(rng, tx, ti):
    _run_both(rng, "euler", tx, ti, with_events=False)


@pytest.mark.parametrize("tx,ti", [(False, False), (True, False), (False, True), (True, True)])
def test_parity_events(rng, tx, ti):
    _run_both(rng, "euler", tx, ti, with_events=True)


def test_parity_events_rk4(rng):
    _run_both(rng, "rk4", False, False, with_events=True)


def test_pure_latent_mode(rng):
    """x_dim == 0 in data: solution width comes from x_init (ref my_solvers.py:97)."""
    (f_np, g_np), (f_jx, g_jx), (t, x, z, v, i, x_init) = _make_problem(rng)
    T, B = t.shape[0], t.shape[1]
    J = jnp.asarray
    got_x, got_i = integrate_dae(
        "euler", f_jx, g_jx, J(x_init), J(t), J(z), J(v),
        J(z)[:-1], J(v)[:-1], x_true=None, i_true=J(i), remat=False,
    )
    exp_x, exp_i = ref.integrate_dae(
        "euler", f_np, g_np, x_init, t, x, z, v, i
    )
    assert got_x.shape == (T, B, x_init.shape[-1])
    np.testing.assert_allclose(np.array(got_x), exp_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.array(got_i), exp_i, rtol=1e-5, atol=1e-6)
