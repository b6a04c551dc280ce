"""Fixed-grid explicit steppers (Butcher-tableau style, functional).

Semantics are pinned to the reference steppers
(``/root/reference/neural_dae/my_fixed_grid.py:12-59``):

  * ``euler``    — order 1, one dynamics eval per step: ``dx = dt * f(t0, x0)``.
  * ``midpoint`` — order 2: eval at ``t0`` and at ``t0 + dt/2`` with
    ``x_mid = x0 + f0*dt/2``. Exogenous inputs are held constant across
    substeps (no input interpolation), as in the reference.
  * ``rk4``      — order 4 via Kutta's 3/8 rule ("alt" variant): nodes
    ``0, 1/3, 2/3, 1``; combine ``(k1 + 3*(k2 + k3) + k4) * dt / 8``
    (reference ``my_fixed_grid.py:38-51``). The reference's DAE branch bug of
    passing ``t0=z0`` (``my_fixed_grid.py:58``) is intentionally NOT
    reproduced.

A stepper is a pure function ``step(f, t0, dt, t1, x0) -> dx`` where ``f`` is
the dynamics closure ``f(t, x) -> dx/dt``. Exogenous inputs (``z``, and for
DAEs ``v``/``i``) are closed over by the caller per time step, which both
matches the constant-across-substeps reference semantics and keeps the
stepper agnostic to ODE vs DAE.
"""

from __future__ import annotations

from typing import Callable, Protocol

import jax.numpy as jnp

Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]

_ONE_THIRD = 1.0 / 3.0
_TWO_THIRDS = 2.0 / 3.0


class Stepper(Protocol):
    order: int
    #: number of dynamics-function evaluations per step
    n_evals: int

    def __call__(self, f: Dynamics, t0, dt, t1, x0):  # pragma: no cover
        ...


class Euler:
    """Explicit Euler: ``dx = dt * f(t0, x0)`` (ref my_fixed_grid.py:12-18)."""

    order = 1
    n_evals = 1

    def __call__(self, f: Dynamics, t0, dt, t1, x0):
        return dt * f(t0, x0)


class Midpoint:
    """Explicit midpoint, order 2 (ref my_fixed_grid.py:20-32)."""

    order = 2
    n_evals = 2

    def __call__(self, f: Dynamics, t0, dt, t1, x0):
        half_dt = 0.5 * dt
        f0 = f(t0, x0)
        x_mid = x0 + f0 * half_dt
        return dt * f(t0 + half_dt, x_mid)


class RK4:
    """Kutta 3/8-rule RK4, order 4 (ref my_fixed_grid.py:35-59)."""

    order = 4
    n_evals = 4

    def __call__(self, f: Dynamics, t0, dt, t1, x0):
        k1 = f(t0, x0)
        k2 = f(t0 + dt * _ONE_THIRD, x0 + dt * k1 * _ONE_THIRD)
        k3 = f(t0 + dt * _TWO_THIRDS, x0 + dt * (k2 - k1 * _ONE_THIRD))
        k4 = f(t1, x0 + dt * (k1 - k2 + k3))
        return (k1 + 3.0 * (k2 + k3) + k4) * dt * 0.125


_STEPPERS = {
    "euler": Euler,
    "midpoint": Midpoint,
    "rk4": RK4,
    "rk4_38": RK4,
}


def get_stepper(name) -> Stepper:
    """Resolve a stepper by name or pass an instance through."""
    if isinstance(name, str):
        try:
            return _STEPPERS[name.lower()]()
        except KeyError:
            raise ValueError(
                f"Unknown stepper {name!r}; choose from {sorted(_STEPPERS)}"
            ) from None
    return name
