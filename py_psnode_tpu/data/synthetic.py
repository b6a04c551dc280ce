"""Synthetic power-system trajectory generator (PSOPS stand-in).

The reference's training data comes from the external C++ PSOPS simulator via
an unobtainable download (``/root/reference/README.md:38-42``), so this module
generates physically-meaningful samples in the same ``.npz`` schema
(SURVEY.md §2.7) for tests, training demos, and benchmarks:

  * :func:`generate_avr_samples` — neural-ODE target: a PSASP-Type-1-style
    excitation system (AVR), states ``x = [xr, Efd]``, inputs
    ``z = [Vt, Vref]``, with a terminal-voltage dip/recovery disturbance
    (two events).
  * :func:`generate_smib_dae_samples` — neural-DAE target: a classical
    2nd-order generator on a single-machine-infinite-bus network, states
    ``x = [delta, omega]``, input ``z = [Pm]``, algebraic bus voltage
    ``v = [vx, vy]`` and injected current ``i = [ix, iy]``, with a fault-on /
    fault-clear disturbance. Unstable swings are truncated with the
    reference's ``-1`` time padding and zeroed mask.
  * :func:`generate_motor_dae_samples` — the LOAD component class: a
    third-order induction motor behind a line, voltage dip/recovery with
    stall truncation.
  * :func:`generate_composite_load_dae_samples` — composite ZIP + motor
    load at one bus; the algebraic output is the total composite current.

Event-stream convention (pinned to ``my_solvers.py:70-72,108-110``): the
recorded stream holds the *pre-jump* (left-limit) value at an event index;
``*_jump`` holds the post-jump value that the solver substitutes for the step
starting at that time. Ground-truth dynamics use post-jump inputs from the
event time onward.
"""

from __future__ import annotations

import numpy as np

from py_psnode_tpu.data.schema import save_dae_samples, save_ode_samples

OMEGA_B = 2.0 * np.pi * 50.0


def _event_indices(rng, N, T, shared_events):
    """Grid-aligned fault-on index and duration, varied per sample and scaled
    to the horizon so short test trajectories still contain the disturbance.

    ``shared_events=True`` draws ONE schedule for the whole file — the regime
    the reference's event handling actually supports (it reads the schedule
    from batch element 0 only, ``neural_base.py:54,190-191``), required for
    apples-to-apples runs against the reference implementation.
    """
    n = 1 if shared_events else N
    f_idx = rng.integers(max(T // 8, 1), max(T // 3, 2), n)
    dur = rng.integers(max(T // 20, 1), max(T // 10, 2), n)
    if shared_events:
        f_idx = np.broadcast_to(f_idx, (N,)).copy()
        dur = np.broadcast_to(dur, (N,)).copy()
    return f_idx, dur


def generate_avr_samples(
    n_samples: int,
    n_steps: int = 1001,
    dt: float = 0.01,
    seed: int = 0,
    substeps: int = 10,
    shared_events: bool = False,
):
    """Vectorized RK4 simulation of a two-state AVR under a voltage dip.

    Dynamics: ``dxr/dt = (Ka*(Vref - Vt) - xr)/Ta``,
    ``dEfd/dt = (xr - Efd)/Te``.

    Returns a dict of arrays in the ODE ``.npz`` schema.
    """
    rng = np.random.default_rng(seed)
    N, T = n_samples, n_steps
    t = np.arange(T) * dt
    ka = rng.uniform(20.0, 60.0, (N, 1))
    ta = rng.uniform(0.05, 0.2, (N, 1))
    te = rng.uniform(0.3, 1.0, (N, 1))
    vref = rng.uniform(0.98, 1.05, (N, 1))
    v_pre = rng.uniform(0.98, 1.04, (N, 1))
    v_fault = rng.uniform(0.3, 0.7, (N, 1))
    v_post = rng.uniform(0.92, 1.02, (N, 1))

    f_idx, dur = _event_indices(rng, N, T, shared_events)
    f_idx, dur = f_idx[:, None], dur[:, None]
    c_idx = np.minimum(f_idx + np.maximum(dur, 1), T - 2)
    t_f = f_idx * dt
    t_c = c_idx * dt

    steps = np.arange(T)[None, :]
    # right-continuous Vt(t) used by the true dynamics
    vt_rc = np.where(
        steps < f_idx, v_pre, np.where(steps < c_idx, v_fault, v_post)
    )
    # left-limit stream recorded in the data
    vt_stream = np.where(
        steps <= f_idx, v_pre, np.where(steps <= c_idx, v_fault, v_post)
    )

    # steady-state init: xr = Ka*(Vref - Vt0), Efd = xr
    xr = ka * (vref - v_pre)
    efd = xr.copy()
    x = np.zeros((N, T, 2))
    x[:, 0, 0], x[:, 0, 1] = xr[:, 0], efd[:, 0]

    h = dt / substeps
    for j in range(1, T):
        vt = vt_rc[:, j - 1 : j]
        for _ in range(substeps):
            def f(xr_, efd_):
                return (ka * (vref - vt) - xr_) / ta, (xr_ - efd_) / te
            k1 = f(xr, efd)
            k2 = f(xr + 0.5 * h * k1[0], efd + 0.5 * h * k1[1])
            k3 = f(xr + 0.5 * h * k2[0], efd + 0.5 * h * k2[1])
            k4 = f(xr + h * k3[0], efd + h * k3[1])
            xr = xr + (h / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
            efd = efd + (h / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        x[:, j, 0], x[:, j, 1] = xr[:, 0], efd[:, 0]

    z = np.stack([vt_stream, np.broadcast_to(vref, (N, T))], axis=-1)
    event_t = np.concatenate([t_f, t_c], axis=1)
    # post-jump z at each event: [Vt_post, Vref]
    z_jump = np.stack(
        [
            np.concatenate([v_fault, v_post], axis=1),
            np.broadcast_to(vref, (N, 2)),
        ],
        axis=-1,
    )
    return dict(
        t=t[None, :, None].repeat(N, 0),
        x=x,
        z=z,
        event_t=event_t,
        z_jump=z_jump,
        mask=np.ones_like(x),
        name=[("xr", "p.u."), ("Efd", "p.u.")],
    )


def generate_smib_dae_samples(
    n_samples: int,
    n_steps: int = 1001,
    dt: float = 0.01,
    seed: int = 0,
    substeps: int = 10,
    unstable_cut: float = 3.0 * np.pi,
    shared_events: bool = False,
):
    """Vectorized RK4 simulation of a classical generator on a SMIB network.

    Swing: ``d(delta)/dt = OMEGA_B * omega``,
    ``d(omega)/dt = (Pm - Pe - D*omega) / (2H)`` with
    ``Pe = Re(E' e^{j delta} * conj(i))`` and the closed-form network solve
    ``i = (E' e^{j delta} - Vinf) / j(Xdp + Xl)``, ``v = Vinf + j Xl i``.

    Disturbance: the infinite-bus voltage dips at ``t_f`` (fault) and recovers
    at ``t_c`` (clear). Trajectories whose angle exceeds ``unstable_cut`` are
    truncated with ``-1`` time padding and zeroed mask (the reference's
    early-termination convention).
    """
    rng = np.random.default_rng(seed)
    N, T = n_samples, n_steps
    t = np.arange(T) * dt
    H = rng.uniform(3.0, 8.0, N)
    D = rng.uniform(0.5, 2.0, N)
    xdp = rng.uniform(0.2, 0.4, N)
    xl = rng.uniform(0.3, 0.6, N)
    pm = rng.uniform(0.4, 1.0, N)
    q0 = rng.uniform(0.0, 0.3, N)
    vinf_pre = np.ones(N)
    vinf_fault = rng.uniform(0.05, 0.5, N)
    vinf_post = rng.uniform(0.9, 1.0, N)

    f_idx, dur = _event_indices(rng, N, T, shared_events)
    c_idx = np.minimum(f_idx + np.maximum(dur, 1), T - 2)
    t_f, t_c = f_idx * dt, c_idx * dt

    # steady-state initialization from the pre-fault power flow
    xt = xdp + xl
    i0c = (pm - 1j * q0) / vinf_pre  # current into infinite bus
    e_c = vinf_pre + 1j * xt * i0c
    ep = np.abs(e_c)
    delta = np.angle(e_c)
    omega = np.zeros(N)

    def network(delta_, vinf_):
        e = ep * np.exp(1j * delta_)
        ic = (e - vinf_) / (1j * xt)
        vc = vinf_ + 1j * xl * ic
        pe = (e * np.conj(ic)).real
        return ic, vc, pe

    x = np.zeros((N, T, 2))
    v = np.zeros((N, T, 2))
    i = np.zeros((N, T, 2))
    steps = np.arange(T)
    h = dt / substeps

    def vinf_at(j, right_continuous):
        if right_continuous:
            return np.where(j < f_idx, vinf_pre, np.where(j < c_idx, vinf_fault, vinf_post))
        return np.where(j <= f_idx, vinf_pre, np.where(j <= c_idx, vinf_fault, vinf_post))

    for j in range(T):
        vinf_ll = vinf_at(j, right_continuous=False)
        ic, vc, _ = network(delta, vinf_ll)
        x[:, j, 0], x[:, j, 1] = delta, omega
        v[:, j, 0], v[:, j, 1] = vc.real, vc.imag
        i[:, j, 0], i[:, j, 1] = ic.real, ic.imag
        if j == T - 1:
            break
        vinf_rc = vinf_at(j, right_continuous=True)
        for _ in range(substeps):
            def f(d_, w_):
                _, _, pe = network(d_, vinf_rc)
                return OMEGA_B * w_, (pm - pe - D * w_) / (2.0 * H)
            k1 = f(delta, omega)
            k2 = f(delta + 0.5 * h * k1[0], omega + 0.5 * h * k1[1])
            k3 = f(delta + 0.5 * h * k2[0], omega + 0.5 * h * k2[1])
            k4 = f(delta + h * k3[0], omega + h * k3[1])
            delta = delta + (h / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
            omega = omega + (h / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])

    tt = np.broadcast_to(t[None, :], (N, T)).copy()
    mask = np.ones((N, T, 1))
    # truncate unstable swings: -1 padding + zero mask from first excursion
    over = np.abs(x[:, :, 0]) > unstable_cut
    for n in np.nonzero(over.any(axis=1))[0]:
        j0 = int(np.argmax(over[n]))
        tt[n, j0:] = -1.0
        mask[n, j0:] = 0.0

    event_t = np.stack([t_f, t_c], axis=1)
    z = np.broadcast_to(pm[:, None, None], (N, T, 1)).copy()
    z_jump = np.broadcast_to(pm[:, None, None], (N, 2, 1)).copy()
    # post-jump terminal voltage at each event time
    v_jump = np.zeros((N, 2, 2))
    for e, idx in enumerate((f_idx, c_idx)):
        d_at = x[np.arange(N), np.minimum(idx, T - 1), 0]
        vinf_e = vinf_fault if e == 0 else vinf_post
        _, vc, _ = network(d_at, vinf_e)
        v_jump[:, e, 0], v_jump[:, e, 1] = vc.real, vc.imag

    return dict(
        t=tt[:, :, None],
        x=x,
        z=z,
        v=v,
        i=i,
        event_t=event_t,
        z_jump=z_jump,
        v_jump=v_jump,
        mask=mask,
        name=[
            ("delta", "rad"),
            ("omega", "p.u."),
            ("ix", "p.u."),
            ("iy", "p.u."),
        ],
    )


def generate_motor_dae_samples(
    n_samples: int,
    n_steps: int = 1001,
    dt: float = 0.01,
    seed: int = 0,
    substeps: int = 10,
    stall_cut: float = 0.5,
    shared_events: bool = False,
):
    """Vectorized RK4 simulation of a third-order induction-motor LOAD on a
    stiff bus — the load-component class of the reference's domain
    (generators, AVR/regulators, loads; ``/root/reference/README.md:6``),
    complementing :func:`generate_avr_samples` (regulator ODE) and
    :func:`generate_smib_dae_samples` (generator DAE).

    Model (synchronous frame, stator resistance neglected, motor sign
    convention — current ``I`` flows INTO the machine):

      * slip:      ``ds/dt = (Tm(s) − Te) / (2H)``
      * rotor EMF: ``dE'/dt = −j·s·ωs·E' − (E' − j(X−X')·I)/T0'``
      * stator:    ``I = (V − E') / (jX')``,  line: ``V = Vinf − jXl·I``
      * torque:    ``Te = Re(E'·conj(I))``  (airgap power ≈ torque in p.u.)
      * load:      ``Tm(s) = Tm0·((1−s)/(1−s0))^γ`` (γ=0 constant-torque …
        γ≈2 fan-type), with ``Tm0 = Te(s0)`` so ``s0`` is an equilibrium.

    DAE sample roles: states ``x = [s, E'x, E'y]``, exogenous input
    ``z = [Tm0]``, algebraic input ``v = [vx, vy]`` (motor bus voltage),
    algebraic output ``i = [ix, iy]`` (stator current drawn). Disturbance:
    the feeding-bus voltage dips at ``t_f`` and recovers at ``t_c``; the
    motor decelerates during the dip and either re-accelerates or stalls —
    stalled trajectories (slip beyond ``stall_cut``) are truncated with the
    reference's ``-1`` time padding and zeroed mask.
    """
    rng = np.random.default_rng(seed)
    N, T = n_samples, n_steps
    t = np.arange(T) * dt
    H = rng.uniform(0.4, 1.5, N)
    t0p = rng.uniform(0.5, 1.5, N)  # rotor open-circuit time constant T0'
    X = rng.uniform(2.5, 4.0, N)  # synchronous (stator + magnetizing)
    Xp = rng.uniform(0.15, 0.30, N)  # transient reactance X'
    xl = rng.uniform(0.04, 0.12, N)
    s0 = rng.uniform(0.005, 0.025, N)
    gamma = rng.uniform(0.0, 2.0, N)  # load torque exponent
    vinf_pre = rng.uniform(0.98, 1.04, N)
    vinf_fault = rng.uniform(0.4, 0.75, N)
    vinf_post = rng.uniform(0.92, 1.02, N)

    f_idx, dur = _event_indices(rng, N, T, shared_events)
    # motors stall within a fraction of the generator-scale dip durations;
    # halve them so the stall/recovery split stays informative
    dur = np.maximum(dur // 2, 1)
    c_idx = np.minimum(f_idx + np.maximum(dur, 1), T - 2)
    t_f, t_c = f_idx * dt, c_idx * dt

    def network(ep_c, vinf_):
        ic = (vinf_ - ep_c) / (1j * (Xp + xl))
        vc = vinf_ - 1j * xl * ic
        te = (ep_c * np.conj(ic)).real
        return ic, vc, te

    # equilibrium at slip s0: (1 + j·s0·ωs·T0')·E' = b·(Vinf − E'),
    # b = (X−X')/(X'+Xl)  →  E' = b·Vinf/(a + b); Tm0 = Te there
    a = 1.0 + 1j * s0 * OMEGA_B * t0p
    b = (X - Xp) / (Xp + xl)
    ep = b * vinf_pre / (a + b)
    slip = s0.copy()
    _, _, tm0 = network(ep, vinf_pre)

    x = np.zeros((N, T, 3))
    v = np.zeros((N, T, 2))
    i = np.zeros((N, T, 2))
    h = dt / substeps

    def vinf_at(j, right_continuous):
        op = np.less if right_continuous else np.less_equal
        return np.where(
            op(j, f_idx), vinf_pre, np.where(op(j, c_idx), vinf_fault, vinf_post)
        )

    for j in range(T):
        ic, vc, _ = network(ep, vinf_at(j, right_continuous=False))
        x[:, j, 0], x[:, j, 1], x[:, j, 2] = slip, ep.real, ep.imag
        v[:, j, 0], v[:, j, 1] = vc.real, vc.imag
        i[:, j, 0], i[:, j, 1] = ic.real, ic.imag
        if j == T - 1:
            break
        vinf_rc = vinf_at(j, right_continuous=True)
        for _ in range(substeps):
            def f(s_, ep_):
                ic_, _, te_ = network(ep_, vinf_rc)
                # clamp the load-torque base: past standstill (s >= 1) the
                # fan-law base would go negative (NaN under fractional γ)
                tm = tm0 * (np.maximum(1.0 - s_, 0.0) / (1.0 - s0)) ** gamma
                ds = (tm - te_) / (2.0 * H)
                dep = (
                    -1j * s_ * OMEGA_B * ep_
                    - (ep_ - 1j * (X - Xp) * ic_) / t0p
                )
                return ds, dep
            k1 = f(slip, ep)
            k2 = f(slip + 0.5 * h * k1[0], ep + 0.5 * h * k1[1])
            k3 = f(slip + 0.5 * h * k2[0], ep + 0.5 * h * k2[1])
            k4 = f(slip + h * k3[0], ep + h * k3[1])
            slip = slip + (h / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
            # a stalled rotor stops at standstill — it cannot reverse
            slip = np.minimum(slip, 1.0)
            ep = ep + (h / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])

    tt = np.broadcast_to(t[None, :], (N, T)).copy()
    mask = np.ones((N, T, 1))
    # truncate stalled motors: -1 padding + zero mask from first excursion
    over = np.abs(x[:, :, 0]) > stall_cut
    for n in np.nonzero(over.any(axis=1))[0]:
        j0 = int(np.argmax(over[n]))
        tt[n, j0:] = -1.0
        mask[n, j0:] = 0.0

    event_t = np.stack([t_f, t_c], axis=1)
    z = np.broadcast_to(tm0[:, None, None], (N, T, 1)).copy()
    z_jump = np.broadcast_to(tm0[:, None, None], (N, 2, 1)).copy()
    # post-jump motor-bus voltage at each event time (state at the event,
    # post-event feeding voltage)
    v_jump = np.zeros((N, 2, 2))
    for e, idx in enumerate((f_idx, c_idx)):
        ep_at = (
            x[np.arange(N), np.minimum(idx, T - 1), 1]
            + 1j * x[np.arange(N), np.minimum(idx, T - 1), 2]
        )
        vinf_e = vinf_fault if e == 0 else vinf_post
        _, vc, _ = network(ep_at, vinf_e)
        v_jump[:, e, 0], v_jump[:, e, 1] = vc.real, vc.imag
    return dict(
        t=tt[:, :, None],
        x=x,
        z=z,
        v=v,
        i=i,
        event_t=event_t,
        z_jump=z_jump,
        v_jump=v_jump,
        mask=mask,
        name=[
            ("slip", "p.u."),
            ("Epx", "p.u."),
            ("Epy", "p.u."),
            ("ix", "p.u."),
            ("iy", "p.u."),
        ],
    )


def generate_composite_load_dae_samples(
    n_samples: int,
    n_steps: int = 1001,
    dt: float = 0.01,
    seed: int = 0,
    substeps: int = 10,
    stall_cut: float = 0.5,
    shared_events: bool = False,
    zip_share=(0.2, 0.6),
    zip_coeffs=(0.4, 0.3, 0.3),
):
    """Composite ZIP + induction-motor load — the standard composite-load
    model class (static ZIP branch in parallel with the dynamic motor of
    :func:`generate_motor_dae_samples` at one load bus behind line ``Xl``).
    Covers the "loads" component class of the reference's domain
    (``/root/reference/README.md:6``) in its composite form.

    Physics added on top of the motor model:

      * ZIP branch:  ``S_zip(V) = (P0 + jQ0)·(αz·|V|² + αi·|V| + αp)``,
        drawing ``I_zip = conj(S_zip/V)``; coefficients ``(αz, αi, αp)``
        are FIXED across samples (else the surrogate could not identify
        them), while the ZIP size varies per sample via ``zip_share`` —
        ``P0 = share·P_motor(s0)``, ``Q0 = P0·tanφ``, φ per sample.
      * network:     ``V = Vinf − jXl·(I_m + I_zip)`` — implicit in ``V``
        through ``|V|``; solved by damped fixed-point iteration (motor
        branch eliminated linearly each sweep, so only the small
        ``jXl·I_zip`` term iterates).

    DAE sample roles: states ``x = [s, E'x, E'y]`` (motor internals),
    exogenous ``z = [Tm0, P0, Q0]`` (per-sample constants identifying the
    composition), algebraic input ``v = [vx, vy]`` (load-bus voltage),
    algebraic output ``i = [ix, iy]`` — the TOTAL composite current
    (motor + ZIP), which is the quantity a composite-load surrogate must
    reproduce. Stalled motors are truncated with ``-1`` padding + zero
    mask exactly as the pure-motor family.
    """
    rng = np.random.default_rng(seed)
    N, T = n_samples, n_steps
    t = np.arange(T) * dt
    H = rng.uniform(0.4, 1.5, N)
    t0p = rng.uniform(0.5, 1.5, N)
    X = rng.uniform(2.5, 4.0, N)
    Xp = rng.uniform(0.15, 0.30, N)
    xl = rng.uniform(0.04, 0.12, N)
    s0 = rng.uniform(0.005, 0.025, N)
    gamma = rng.uniform(0.0, 2.0, N)
    vinf_pre = rng.uniform(0.98, 1.04, N)
    vinf_fault = rng.uniform(0.4, 0.75, N)
    vinf_post = rng.uniform(0.92, 1.02, N)
    share = rng.uniform(*zip_share, N)
    tanphi = np.tan(np.arccos(rng.uniform(0.85, 0.98, N)))
    az, ai, ap = zip_coeffs

    f_idx, dur = _event_indices(rng, N, T, shared_events)
    dur = np.maximum(dur // 2, 1)
    c_idx = np.minimum(f_idx + np.maximum(dur, 1), T - 2)
    t_f, t_c = f_idx * dt, c_idx * dt

    r = xl / Xp  # line/transient reactance ratio (motor branch elimination)

    def solve_bus(ep_c, vinf_, p0, q0, n_iter=40):
        """Fixed-point for the load-bus voltage: the motor branch is linear
        in V and eliminated exactly each sweep; only the ZIP current
        iterates. Returns (V, I_motor, I_zip, Te)."""
        iz = np.zeros_like(ep_c)
        for _ in range(n_iter):
            vc_new = (vinf_ + r * ep_c - 1j * xl * iz) / (1.0 + r)
            vm = np.abs(vc_new)
            # |V| floor: the constant-P branch current diverges as V→0
            sz = (p0 + 1j * q0) * (az * vm**2 + ai * vm + ap)
            iz = np.conj(sz / np.where(vm < 0.05, 0.05, vc_new))
            vc = vc_new
        im = (vc - ep_c) / (1j * Xp)
        te = (ep_c * np.conj(im)).real
        return vc, im, iz, te

    # joint equilibrium at slip s0: a·E' = c·(V−E') with c=(X−X')/X'
    # (rotor EMF balance), alternated with the bus solve
    a = 1.0 + 1j * s0 * OMEGA_B * t0p
    c = (X - Xp) / Xp
    ep = c * vinf_pre / (a + c)  # ZIP-free starting guess
    p0 = np.zeros(N)
    q0 = np.zeros(N)
    for _ in range(60):
        vc, im, _, te = solve_bus(ep, vinf_pre, p0, q0)
        ep = c * vc / (a + c)
        pm = (vc * np.conj(im)).real  # motor terminal power at equilibrium
        p0 = share * np.maximum(pm, 1e-3)
        q0 = p0 * tanphi
    _, _, _, tm0 = solve_bus(ep, vinf_pre, p0, q0)

    x = np.zeros((N, T, 3))
    v = np.zeros((N, T, 2))
    i = np.zeros((N, T, 2))
    h = dt / substeps
    slip = s0.copy()

    def vinf_at(j, right_continuous):
        op = np.less if right_continuous else np.less_equal
        return np.where(
            op(j, f_idx), vinf_pre, np.where(op(j, c_idx), vinf_fault, vinf_post)
        )

    for j in range(T):
        vc, im, iz, _ = solve_bus(ep, vinf_at(j, right_continuous=False), p0, q0)
        x[:, j, 0], x[:, j, 1], x[:, j, 2] = slip, ep.real, ep.imag
        v[:, j, 0], v[:, j, 1] = vc.real, vc.imag
        itot = im + iz
        i[:, j, 0], i[:, j, 1] = itot.real, itot.imag
        if j == T - 1:
            break
        vinf_rc = vinf_at(j, right_continuous=True)
        for _ in range(substeps):
            def f(s_, ep_):
                _, im_, _, te_ = solve_bus(ep_, vinf_rc, p0, q0, n_iter=15)
                tm = tm0 * (np.maximum(1.0 - s_, 0.0) / (1.0 - s0)) ** gamma
                ds = (tm - te_) / (2.0 * H)
                dep = (
                    -1j * s_ * OMEGA_B * ep_
                    - (ep_ - 1j * (X - Xp) * im_) / t0p
                )
                return ds, dep
            k1 = f(slip, ep)
            k2 = f(slip + 0.5 * h * k1[0], ep + 0.5 * h * k1[1])
            k3 = f(slip + 0.5 * h * k2[0], ep + 0.5 * h * k2[1])
            k4 = f(slip + h * k3[0], ep + h * k3[1])
            slip = slip + (h / 6.0) * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
            slip = np.minimum(slip, 1.0)
            ep = ep + (h / 6.0) * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])

    tt = np.broadcast_to(t[None, :], (N, T)).copy()
    mask = np.ones((N, T, 1))
    over = np.abs(x[:, :, 0]) > stall_cut
    for n in np.nonzero(over.any(axis=1))[0]:
        j0 = int(np.argmax(over[n]))
        tt[n, j0:] = -1.0
        mask[n, j0:] = 0.0

    event_t = np.stack([t_f, t_c], axis=1)
    zrow = np.stack([tm0, p0, q0], axis=-1)  # per-sample constants
    z = np.broadcast_to(zrow[:, None, :], (N, T, 3)).copy()
    z_jump = np.broadcast_to(zrow[:, None, :], (N, 2, 3)).copy()
    v_jump = np.zeros((N, 2, 2))
    for e, idx in enumerate((f_idx, c_idx)):
        ep_at = (
            x[np.arange(N), np.minimum(idx, T - 1), 1]
            + 1j * x[np.arange(N), np.minimum(idx, T - 1), 2]
        )
        vinf_e = vinf_fault if e == 0 else vinf_post
        vc, _, _, _ = solve_bus(ep_at, vinf_e, p0, q0)
        v_jump[:, e, 0], v_jump[:, e, 1] = vc.real, vc.imag
    return dict(
        t=tt[:, :, None],
        x=x,
        z=z,
        v=v,
        i=i,
        event_t=event_t,
        z_jump=z_jump,
        v_jump=v_jump,
        mask=mask,
        name=[
            ("slip", "p.u."),
            ("Epx", "p.u."),
            ("Epy", "p.u."),
            ("ix", "p.u."),
            ("iy", "p.u."),
        ],
    )


def write_avr_dataset(dir_path, n_train=320, n_test=64, n_steps=1001, seed=0):
    """Write ``training.npz`` / ``testing.npz`` AVR (ODE) sample files."""
    import pathlib

    d = pathlib.Path(dir_path)
    d.mkdir(parents=True, exist_ok=True)
    for name, n, s in (("training", n_train, seed), ("testing", n_test, seed + 1)):
        data = generate_avr_samples(n, n_steps=n_steps, seed=s)
        save_ode_samples(d / f"{name}.npz", **data)
    return d / "training.npz", d / "testing.npz"


def write_smib_dataset(dir_path, n_train=320, n_test=64, n_steps=1001, seed=0):
    """Write ``training.npz`` / ``testing.npz`` SMIB (DAE) sample files."""
    import pathlib

    d = pathlib.Path(dir_path)
    d.mkdir(parents=True, exist_ok=True)
    for name, n, s in (("training", n_train, seed), ("testing", n_test, seed + 1)):
        data = generate_smib_dae_samples(n, n_steps=n_steps, seed=s)
        save_dae_samples(d / f"{name}.npz", **data)
    return d / "training.npz", d / "testing.npz"


def write_motor_dataset(dir_path, n_train=320, n_test=64, n_steps=1001, seed=0):
    """Write ``training.npz`` / ``testing.npz`` induction-motor load (DAE)
    sample files."""
    import pathlib

    d = pathlib.Path(dir_path)
    d.mkdir(parents=True, exist_ok=True)
    for name, n, s in (("training", n_train, seed), ("testing", n_test, seed + 1)):
        data = generate_motor_dae_samples(n, n_steps=n_steps, seed=s)
        save_dae_samples(d / f"{name}.npz", **data)
    return d / "training.npz", d / "testing.npz"


def write_composite_dataset(dir_path, n_train=320, n_test=64, n_steps=1001,
                            seed=0):
    """Write ``training.npz`` / ``testing.npz`` composite ZIP+motor load
    (DAE) sample files."""
    import pathlib

    d = pathlib.Path(dir_path)
    d.mkdir(parents=True, exist_ok=True)
    for name, n, s in (("training", n_train, seed), ("testing", n_test, seed + 1)):
        data = generate_composite_load_dae_samples(n, n_steps=n_steps, seed=s)
        save_dae_samples(d / f"{name}.npz", **data)
    return d / "training.npz", d / "testing.npz"
