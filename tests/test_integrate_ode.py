"""Golden-trajectory parity: lax.scan ODE solver vs numpy re-derivation."""

import jax.numpy as jnp
import numpy as np
import pytest

import np_reference as ref
from py_psnode_tpu.solvers import event_match, integrate_ode, jumped_stream


def _make_problem(rng, T=20, B=3, xd=2, zd=2):
    W1 = rng.normal(size=(xd, xd)) * 0.5
    W2 = rng.normal(size=(zd, xd)) * 0.5

    def f_np(t, x, z):
        return np.tanh(x @ W1 + z @ W2)

    def f_jx(t, x, z):
        return jnp.tanh(x @ jnp.asarray(W1) + z @ jnp.asarray(W2))

    t = np.cumsum(rng.uniform(0.01, 0.03, (T, B, 1)), axis=0)
    t = np.broadcast_to(t[:, :1, :], (T, B, 1)).copy()  # shared grid per batch col? keep per-sample grids
    t = np.cumsum(np.full((T, B, 1), 0.02), axis=0) - 0.02
    x = rng.normal(size=(T, B, xd))
    z = rng.normal(size=(T, B, zd))
    return f_np, f_jx, t, x, z


@pytest.mark.parametrize("solver", ["euler", "midpoint", "rk4"])
@pytest.mark.parametrize("input_true_x", [False, True])
def test_parity_no_events(rng, solver, input_true_x):
    f_np, f_jx, t, x, z = _make_problem(rng)
    expected = ref.integrate_ode(solver, f_np, t, x, z, input_true_x=input_true_x)
    got = integrate_ode(
        solver,
        f_jx,
        jnp.asarray(t),
        jnp.asarray(x),
        jnp.asarray(z[:-1]),
        input_true_x=input_true_x,
        remat=False,
    )
    np.testing.assert_allclose(np.array(got), expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_parity_with_events(rng, solver):
    f_np, f_jx, t, x, z = _make_problem(rng, T=15, B=4)
    B = t.shape[1]
    # per-sample schedules: sample b gets an event at its own grid time
    event_t = np.stack(
        [np.array([t[3 + b, b, 0], -1.0]) for b in range(B)], axis=0
    )
    z_jump = rng.normal(size=(B, 2, z.shape[-1]))

    expected = ref.integrate_ode(
        solver, f_np, t, x, z, event_t=event_t, z_jump=z_jump
    )

    # batch-major event plumbing as the models do it
    t_bm = jnp.asarray(np.swapaxes(t, 0, 1))
    z_bm = jnp.asarray(np.swapaxes(z, 0, 1))
    is_event, e_idx = event_match(t_bm, jnp.asarray(event_t))
    z_used = jumped_stream(z_bm, jnp.asarray(z_jump), is_event, e_idx)
    z_step = jnp.swapaxes(z_used, 0, 1)[:-1]

    got = integrate_ode(
        solver, f_jx, jnp.asarray(t), jnp.asarray(x), z_step, remat=False
    )
    np.testing.assert_allclose(np.array(got), expected, rtol=1e-5, atol=1e-6)


def test_remat_matches_no_remat(rng):
    f_np, f_jx, t, x, z = _make_problem(rng)
    a = integrate_ode(
        "rk4", f_jx, jnp.asarray(t), jnp.asarray(x), jnp.asarray(z[:-1]), remat=False
    )
    b = integrate_ode(
        "rk4", f_jx, jnp.asarray(t), jnp.asarray(x), jnp.asarray(z[:-1]), remat=True
    )
    np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-6)


def test_piecewise_analytic_event():
    """dx/dt = -(x - z): z jumps 0→1 at t=0.5; compare against the
    piecewise-analytic solution on a fine Euler grid."""
    T, dt = 501, 0.002
    t = np.arange(T)[:, None, None] * dt
    x = np.zeros((T, 1, 1))
    x[0] = 1.0
    z = np.where(t <= 0.5, 0.0, 1.0)  # left-limit stream
    event_t = np.asarray([[0.5]])
    z_jump = np.asarray([[[1.0]]])

    f = lambda tt, xx, zz: -(xx - zz)
    t_bm = jnp.asarray(np.swapaxes(t, 0, 1))
    z_bm = jnp.asarray(np.swapaxes(z, 0, 1))
    is_event, e_idx = event_match(t_bm, jnp.asarray(event_t))
    z_used = jumped_stream(z_bm, jnp.asarray(z_jump), is_event, e_idx)
    sol = integrate_ode(
        "rk4",
        f,
        jnp.asarray(t),
        jnp.asarray(x),
        jnp.swapaxes(z_used, 0, 1)[:-1],
        remat=False,
    )
    # analytic: x(t) = e^{-t} for t<=0.5; then 1 + (x(0.5)-1) e^{-(t-0.5)}
    x_half = np.exp(-0.5)
    tt = t[:, 0, 0]
    analytic = np.where(
        tt <= 0.5, np.exp(-tt), 1.0 + (x_half - 1.0) * np.exp(-(tt - 0.5))
    )
    np.testing.assert_allclose(np.array(sol)[:, 0, 0], analytic, atol=5e-5)
