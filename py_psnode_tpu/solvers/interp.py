"""Interpolation helpers (ref my_solvers.py:177-192)."""

from __future__ import annotations

import jax.numpy as jnp


def cubic_hermite_interp(t0, x0, f0, t1, x1, f1, t):
    """Cubic Hermite interpolation between ``(t0, x0, f0)`` and ``(t1, x1, f1)``."""
    h = (t - t0) / (t1 - t0)
    h00 = (1 + 2 * h) * (1 - h) * (1 - h)
    h10 = h * (1 - h) * (1 - h)
    h01 = h * h * (3 - 2 * h)
    h11 = h * h * (h - 1)
    dt = t1 - t0
    return h00 * x0 + h10 * dt * f0 + h01 * x1 + h11 * dt * f1


def linear_interp(t0, t1, x0, x1, t):
    """Linear interpolation; exact at the endpoints."""
    slope = (t - t0) / (t1 - t0)
    out = x0 + slope * (x1 - x0)
    out = jnp.where(t == t0, x0, out)
    return jnp.where(t == t1, x1, out)
