"""Solver-order tests against analytic ODEs (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.solvers import Euler, Midpoint, RK4, get_stepper, integrate_ode


def _solve_decay(stepper, n_steps):
    """dx/dt = -x on [0, 1], x0 = 1 → x(1) = e^{-1}."""
    B = 1
    t = jnp.linspace(0.0, 1.0, n_steps + 1)[:, None, None].repeat(B, 1)
    x = jnp.zeros((n_steps + 1, B, 1)).at[0].set(1.0)
    z = jnp.zeros((n_steps, B, 0))
    f = lambda tt, xx, zz: -xx
    sol = integrate_ode(stepper, f, t, x, z, remat=False)
    return float(sol[-1, 0, 0])


@pytest.mark.parametrize(
    "stepper,order,grids",
    [(Euler(), 1, (16, 32, 64)), (Midpoint(), 2, (8, 16, 32)), (RK4(), 4, (2, 4, 8))],
)
def test_global_error_order(stepper, order, grids):
    # step counts chosen per order so errors stay above the float32 noise floor
    exact = np.exp(-1.0)
    errs = []
    for n in grids:
        errs.append(abs(_solve_decay(stepper, n) - exact))
    rates = [np.log2(errs[k] / errs[k + 1]) for k in range(len(errs) - 1)]
    for r in rates:
        assert r > order - 0.35, f"observed rate {r} for order-{order} stepper"


def test_rk4_38_single_step_coefficients():
    """One RK4 step on dx/dt = f(t) matches the hand-evaluated 3/8 rule."""
    f = lambda t, x: jnp.asarray(t**3 + 2.0 * t)
    t0, dt = 0.3, 0.2
    t1 = t0 + dt
    dx = RK4()(f, t0, dt, t1, jnp.asarray(0.0))
    k1 = t0**3 + 2 * t0
    k2 = (t0 + dt / 3) ** 3 + 2 * (t0 + dt / 3)
    k3 = (t0 + 2 * dt / 3) ** 3 + 2 * (t0 + 2 * dt / 3)
    k4 = t1**3 + 2 * t1
    expected = (k1 + 3 * (k2 + k3) + k4) * dt / 8.0
    np.testing.assert_allclose(float(dx), expected, rtol=1e-6)
    # 3/8 quadrature is exact for cubics: compare with ∫ f over the step
    integral = (t1**4 - t0**4) / 4 + t1**2 - t0**2
    np.testing.assert_allclose(float(dx), integral, rtol=1e-6)


def test_midpoint_holds_inputs_constant():
    """z must NOT be interpolated across substeps (ref my_fixed_grid.py:20-32)."""
    def f(tt, xx, zz):
        return zz

    t = jnp.asarray([[[0.0]], [[1.0]]])
    x = jnp.zeros((2, 1, 1))
    z = jnp.ones((1, 1, 1)) * 7.0
    sol = integrate_ode(Midpoint(), f, t, x, z, remat=False)
    # midpoint with constant f: x1 = x0 + dt * z
    np.testing.assert_allclose(np.array(sol[-1]), 7.0, rtol=1e-6)


def test_get_stepper():
    assert isinstance(get_stepper("euler"), Euler)
    assert isinstance(get_stepper("rk4_38"), RK4)
    s = RK4()
    assert get_stepper(s) is s
    with pytest.raises(ValueError):
        get_stepper("dopri5")
