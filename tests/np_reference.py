"""Independent numpy re-derivation of the reference stepping semantics.

This is the "pin the semantics, don't port the code" oracle (SURVEY.md §4.3):
a direct numpy transcription of the *documented* stepping rules of
``/root/reference/neural_dae/my_solvers.py`` / ``my_fixed_grid.py``,
generalized to per-sample event schedules (the framework's semantics). Golden
tests integrate the same dynamics with both this and the lax.scan solvers and
assert agreement.
"""

import numpy as np

_ONE_THIRD = 1.0 / 3.0
_TWO_THIRDS = 2.0 / 3.0


def step(name, f, t0, dt, t1, x0):
    if name == "euler":
        return dt * f(t0, x0)
    if name == "midpoint":
        half = 0.5 * dt
        f0 = f(t0, x0)
        return dt * f(t0 + half, x0 + f0 * half)
    if name == "rk4":
        k1 = f(t0, x0)
        k2 = f(t0 + dt * _ONE_THIRD, x0 + dt * k1 * _ONE_THIRD)
        k3 = f(t0 + dt * _TWO_THIRDS, x0 + dt * (k2 - k1 * _ONE_THIRD))
        k4 = f(t1, x0 + dt * (k1 - k2 + k3))
        return (k1 + 3.0 * (k2 + k3) + k4) * dt * 0.125
    raise ValueError(name)


def _apply_events(t0, stream_val, event_t, jump):
    """Per-sample event substitution at step-start time t0: [B,1],[B,D]."""
    out = stream_val.copy()
    if event_t is None:
        return out
    B = out.shape[0]
    for b in range(B):
        for e in range(event_t.shape[1]):
            if t0[b, 0] == event_t[b, e]:
                out[b] = jump[b, e]
                break
    return out


def _is_event(t0, event_t):
    if event_t is None:
        return np.zeros(t0.shape[0], dtype=bool)
    return np.array(
        [np.any(t0[b, 0] == event_t[b]) for b in range(t0.shape[0])]
    )


def integrate_ode(
    solver, f, t, x, z, event_t=None, z_jump=None, input_true_x=False
):
    """Time-major [T,B,*] arrays; f(t0, x, z) -> dx/dt."""
    T = t.shape[0]
    sol = np.zeros_like(x)
    sol[0] = x[0]
    x0 = x[0].copy()
    for j in range(1, T):
        t0, t1 = t[j - 1], t[j]
        dt = t1 - t0
        z0 = _apply_events(t0, z[j - 1], event_t, z_jump)
        x_in = x[j - 1] if input_true_x else x0
        fz = lambda tt, xx: f(tt, xx, z0)
        x1 = x_in + step(solver, fz, t0, dt, t1, x_in)
        sol[j] = x1
        x0 = x1
    return sol


def integrate_dae(
    solver,
    f,
    g,
    x_init,
    t,
    x,
    z,
    v,
    i,
    event_t=None,
    z_jump=None,
    v_jump=None,
    input_true_x=False,
    input_true_i=False,
):
    """Time-major; f(t0,x,z,v,i) -> dx/dt; g(x,z,v) -> i.

    Pins: lagged-i coupling (my_solvers.py:119,121), algebraic recompute on
    event steps feeding the differential step only when input_true_i is off
    (:108-114), g evaluated at t1 with raw inputs (:121), per-sample events.
    """
    T, B = t.shape[0], t.shape[1]
    x0 = x_init.copy()
    i0 = g(x[0] if input_true_x else x0, z[0], v[0])
    xd = x_init.shape[-1]
    sol_x = np.zeros((T, B, xd), dtype=x_init.dtype)
    sol_i = np.zeros_like(i)
    sol_x[0] = x0
    sol_i[0] = i0
    for j in range(1, T):
        t0, t1 = t[j - 1], t[j]
        dt = t1 - t0
        z0 = _apply_events(t0, z[j - 1], event_t, z_jump)
        v0 = _apply_events(t0, v[j - 1], event_t, v_jump)
        ev = _is_event(t0, event_t)
        i_in = i0.copy()
        if np.any(ev):
            i_ev = g(x0, z0, v0)
            i_in[ev] = i_ev[ev]
        if input_true_i:
            i_in = i[j - 1]
        x_in = x[j - 1] if input_true_x else x0
        fz = lambda tt, xx: f(tt, xx, z0, v0, i_in)
        x1 = x_in + step(solver, fz, t0, dt, t1, x_in)
        i1 = g(x[j] if input_true_x else x1, z[j], v[j])
        sol_x[j] = x1
        sol_i[j] = i1
        x0 = x1
        i0 = i1
    return sol_x, sol_i
