"""Golden tests for the interpolation helpers against the reference
semantics (ref my_solvers.py:177-192): exact endpoint values, the midpoint
formula, Hermite reproduction of cubics, and the branchless endpoint guard
of linear_interp."""

import numpy as np

from py_psnode_tpu.solvers.interp import cubic_hermite_interp, linear_interp


def _ref_cubic_hermite(t0, x0, f0, t1, x1, f1, t):
    """numpy transcription of the reference formula (my_solvers.py:177-184)."""
    h = (t - t0) / (t1 - t0)
    h00 = (1 + 2 * h) * (1 - h) * (1 - h)
    h10 = h * (1 - h) * (1 - h)
    h01 = h * h * (3 - 2 * h)
    h11 = h * h * (h - 1)
    dt = t1 - t0
    return h00 * x0 + h10 * dt * f0 + h01 * x1 + h11 * dt * f1


def test_linear_interp_endpoints_and_midpoint():
    t0, t1 = 0.5, 1.5
    x0, x1 = np.array([1.0, -2.0]), np.array([3.0, 4.0])
    # exact at endpoints (ref returns x0/x1 verbatim via early exits)
    np.testing.assert_array_equal(np.asarray(linear_interp(t0, t1, x0, x1, t0)), x0)
    np.testing.assert_array_equal(np.asarray(linear_interp(t0, t1, x0, x1, t1)), x1)
    mid = np.asarray(linear_interp(t0, t1, x0, x1, 1.0))
    np.testing.assert_allclose(mid, (x0 + x1) / 2, rtol=1e-12)
    # arbitrary interior point matches slope formula
    t = 0.9
    np.testing.assert_allclose(
        np.asarray(linear_interp(t0, t1, x0, x1, t)),
        x0 + (t - t0) / (t1 - t0) * (x1 - x0),
        rtol=1e-6,
    )


def test_cubic_hermite_matches_reference_formula(rng):
    t0, t1 = 0.2, 1.1
    x0 = rng.normal(size=(3,))
    x1 = rng.normal(size=(3,))
    f0 = rng.normal(size=(3,))
    f1 = rng.normal(size=(3,))
    for t in (t0, 0.5, 0.83, t1):
        got = np.asarray(cubic_hermite_interp(t0, x0, f0, t1, x1, f1, t))
        want = _ref_cubic_hermite(t0, x0, f0, t1, x1, f1, t)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_cubic_hermite_reproduces_cubics():
    """A cubic Hermite interpolant is EXACT for cubic polynomials."""
    coeffs = np.array([0.7, -1.3, 0.5, 2.0])  # a + b t + c t^2 + d t^3
    p = lambda t: coeffs[0] + coeffs[1] * t + coeffs[2] * t**2 + coeffs[3] * t**3
    dp = lambda t: coeffs[1] + 2 * coeffs[2] * t + 3 * coeffs[3] * t**2
    t0, t1 = -0.4, 1.7
    for t in np.linspace(t0, t1, 9):
        got = float(np.asarray(
            cubic_hermite_interp(t0, p(t0), dp(t0), t1, p(t1), dp(t1), t)
        ))
        np.testing.assert_allclose(got, p(t), rtol=1e-6, atol=1e-8)


def test_cubic_hermite_endpoints():
    t0, t1 = 0.0, 1.0
    x0, x1, f0, f1 = 2.0, -3.0, 10.0, -10.0
    np.testing.assert_allclose(
        float(np.asarray(cubic_hermite_interp(t0, x0, f0, t1, x1, f1, t0))), x0
    )
    np.testing.assert_allclose(
        float(np.asarray(cubic_hermite_interp(t0, x0, f0, t1, x1, f1, t1))), x1
    )
