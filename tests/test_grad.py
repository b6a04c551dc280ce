"""Gradient tests (SURVEY.md §4.4): finite-difference BPTT-through-scan
check; remat vs naive gradient equality; robust-loss guard semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from py_psnode_tpu.solvers import integrate_ode
from py_psnode_tpu.train.losses import robust_time_series_loss


def _loss(w, t, x, z, remat):
    f = lambda tt, xx, zz: jnp.tanh(xx * w + zz)
    sol = integrate_ode("midpoint", f, t, x, z[:-1], remat=remat)
    return jnp.sum(sol**2)


def test_bptt_finite_difference():
    T, B = 30, 2
    t = jnp.asarray(np.cumsum(np.full((T, B, 1), 0.05), axis=0) - 0.05)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(T, B, 1)))
    z = jnp.asarray(rng.normal(size=(T, B, 1)))
    w0 = 0.37
    g = jax.grad(_loss)(w0, t, x, z, False)
    eps = 1e-6
    fd = (_loss(w0 + eps, t, x, z, False) - _loss(w0 - eps, t, x, z, False)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_remat_grads_match():
    T, B = 50, 3
    t = jnp.asarray(np.cumsum(np.full((T, B, 1), 0.02), axis=0) - 0.02)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(T, B, 2)))
    z = jnp.asarray(rng.normal(size=(T, B, 2)))

    def loss(w, remat):
        f = lambda tt, xx, zz: jnp.tanh(xx @ w) + zz
        sol = integrate_ode("rk4", f, t, x, z[:-1], remat=remat)
        return jnp.sum(sol**2)

    w = jnp.asarray(rng.normal(size=(2, 2)))
    g_naive = jax.grad(loss)(w, False)
    g_remat = jax.grad(loss)(w, True)
    np.testing.assert_allclose(np.array(g_naive), np.array(g_remat), rtol=1e-10)


def test_robust_loss_nan_guard():
    loss = jnp.asarray([0.1, jnp.nan, 0.3])
    out, nan = robust_time_series_loss(loss)
    assert bool(nan)
    assert float(out) == 0.0
    g = jax.grad(lambda l: robust_time_series_loss(l)[0])(loss)
    assert np.isfinite(np.array(g)).all()


def test_robust_scalar_guard_inf_is_zero_step():
    """+/-inf losses must take the zero-step branch, not the over-limit
    normalization: inf / stop_grad(inf) is NaN, which would poison the
    logged window loss (the step itself was already saved by
    zero_nonfinite_grads)."""
    from py_psnode_tpu.train.optim import robust_scalar_guard

    for bad in (jnp.inf, -jnp.inf, jnp.nan):
        out, tripped = robust_scalar_guard(jnp.asarray(bad), limit=1.0)
        assert bool(tripped)
        assert float(out) == 0.0
        g = jax.grad(lambda l: robust_scalar_guard(l, limit=1.0)[0])(
            jnp.asarray(bad)
        )
        assert np.isfinite(float(g))
    # finite over-limit still normalizes to 1 with 1/stop_grad(l) grads
    out, tripped = robust_scalar_guard(jnp.asarray(4.0), limit=1.0)
    assert bool(tripped) and float(out) == 1.0


def test_robust_loss_magnitude_guard():
    # every element >= 1e-6 is normalized to value 1 with a
    # direction-preserving gradient 1/stop_grad(l) (ref utils.py:40-42)
    loss = jnp.asarray([0.5, 3.0])
    out, nan = robust_time_series_loss(loss)
    assert not bool(nan)
    np.testing.assert_allclose(float(out), 2.0, rtol=1e-6)
    g = jax.grad(lambda l: robust_time_series_loss(l)[0])(loss)
    np.testing.assert_allclose(np.array(g), [2.0, 1.0 / 3.0], rtol=1e-6)

    # with limit_loss: values in (1, limit] keep their raw sum (ref :41)
    out2, _ = robust_time_series_loss(loss, limit_loss=10.0)
    np.testing.assert_allclose(float(out2), 3.5, rtol=1e-6)
    # exceeding the limit escalates back to full normalization (ref :38-40)
    out3, _ = robust_time_series_loss(jnp.asarray([0.5, 30.0]), limit_loss=10.0)
    np.testing.assert_allclose(float(out3), 2.0, rtol=1e-6)
