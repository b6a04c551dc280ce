"""Multi-shooting (windowed) integration — the principled "sequence
parallelism" for neural-ODE training (SURVEY.md §2.6).

An IVP solve is inherently sequential in time; the reference copes with long
horizons via ``cut_length`` truncation and teacher forcing. Multi-shooting
splits the horizon into K windows whose initial states are taken from the
*data* (per-window teacher forcing), then integrates all windows AT ONCE by
folding the window axis into the batch axis — turning wall-clock O(T) into
O(T/K) and feeding the MXU K×-larger matmuls. The continuity defects between
a window's rollout end and the next window's true start are returned for an
optional penalty term (classical multiple-shooting).

This mirrors the reference's windowing levers exactly (``input_true_x``
teacher forcing ``my_solvers.py:74``, ``cut_length`` ``neural_base.py:22``)
but keeps all windows training in parallel within one compiled solve.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from py_psnode_tpu.solvers.integrate import integrate_dae, integrate_ode
from py_psnode_tpu.solvers.steppers import Stepper


def _window_fold(a: jnp.ndarray, K: int, L: int, overlap: int) -> jnp.ndarray:
    """``[T(+), B, D] → [L+overlap, K*B, D]``: gather K windows of length
    ``L+overlap`` starting at ``w*L`` and merge the window axis into batch."""
    B = a.shape[1]
    windows = jnp.stack([a[w * L : w * L + L + overlap] for w in range(K)], axis=0)
    # [K, L+o, B, D] → [L+o, K, B, D] → [L+o, K*B, D]
    return jnp.swapaxes(windows, 0, 1).reshape(L + overlap, K * B, a.shape[-1])


def _window_unfold(sol: jnp.ndarray, K: int, L: int, B: int) -> jnp.ndarray:
    """Inverse of the fold for a ``[L+1, K*B, D]`` windowed solution →
    stitched ``[K*L+1, B, D]``: index 0 from window 0, then each window's
    rollout points 1..L."""
    w = sol.reshape(L + 1, K, B, sol.shape[-1])
    head = w[0, 0][None]  # global initial point
    body = jnp.swapaxes(w[1:], 0, 1).reshape(K * L, B, sol.shape[-1])
    return jnp.concatenate([head, body], axis=0)


def tile_batch(a: jnp.ndarray, K: int) -> jnp.ndarray:
    """Tile a per-sample constant (e.g. ``all_initial`` [B, D]) to the folded
    K*B batch used inside the windows."""
    return jnp.tile(a, (K, 1))


def multishoot_ode(
    stepper: Stepper,
    de_fn: Callable,
    t: jnp.ndarray,
    x: jnp.ndarray,
    z_step: jnp.ndarray,
    n_windows: int,
    *,
    remat=True,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed ODE solve.

    Args:
      de_fn: dynamics over the FOLDED batch ``[K*B, ...]`` (tile per-sample
        closures with :func:`tile_batch`).
      t/x: ``[T, B, *]`` (time-major); ``(T-1) % n_windows == 0`` required.
      z_step: ``[T-1, B, zd]`` event-adjusted inputs.

    Returns:
      ``(solution [T, B, xd], gaps [K-1, B, xd])`` where ``gaps[w] =
      rollout_end(window w) − true_start(window w+1)``.
    """
    T, B = t.shape[0], t.shape[1]
    K = n_windows
    if (T - 1) % K:
        raise ValueError(f"(T-1)={T - 1} not divisible by n_windows={K}")
    L = (T - 1) // K

    tw = _window_fold(t, K, L, overlap=1)
    xw = _window_fold(x, K, L, overlap=1)
    zw = _window_fold(z_step, K, L, overlap=0)
    sol_w = integrate_ode(
        stepper, de_fn, tw, xw, zw, remat=remat, unroll=unroll
    )
    solution = _window_unfold(sol_w, K, L, B)
    ends = sol_w[-1].reshape(K, B, -1)[:-1]  # rollout end of windows 0..K-2
    next_starts = xw[0].reshape(K, B, -1)[1:]  # true start of windows 1..K-1
    gaps = ends - next_starts
    return solution, gaps


def multishoot_dae(
    stepper: Stepper,
    de_fn: Callable,
    ae_fn: Callable,
    x0w: jnp.ndarray,
    t: jnp.ndarray,
    z: jnp.ndarray,
    v: jnp.ndarray,
    i: jnp.ndarray,
    z_step: jnp.ndarray,
    v_step: jnp.ndarray,
    n_windows: int,
    is_event: Optional[jnp.ndarray] = None,
    *,
    remat=True,
    unroll: int = 1,
):
    """Windowed semi-explicit DAE solve.

    Args:
      x0w: folded window-start differential states ``[K*B, xd]`` in the
        ``_window_fold`` order (window-major). Callers use the model's
        ``Init_Func`` output for window 0 (the reference's t=0 contract,
        ref neural_01_DAE_01_no_encode.py:98) and the TRUE data states for
        windows 1.. — per-window teacher forcing, the same data the
        reference's ``input_true_x`` lever reads (my_solvers.py:113).
        An earlier design derived every window's start from
        ``Init_Func(z, v, i)`` at that window's instantaneous inputs; that
        is only identifiable at the t=0 equilibrium — mid-transient the
        same (z, v, i) maps to many x, so windows 1.. trained the shared
        nets on a non-invertible target and measurably DIVERGED the full
        rollout (benchmarks/multishoot_study.py, round 3).

    Returns ``(x_solution [T, B, xd], i_solution [T, B, id],
    gaps [K-1, B, xd])`` where gaps compare each window's rollout end with
    the next window's start.
    """
    T, B = t.shape[0], t.shape[1]
    K = n_windows
    if (T - 1) % K:
        raise ValueError(f"(T-1)={T - 1} not divisible by n_windows={K}")
    L = (T - 1) // K

    tw = _window_fold(t, K, L, 1)
    zw_full = _window_fold(z, K, L, 1)
    vw_full = _window_fold(v, K, L, 1)
    iw_full = _window_fold(i, K, L, 1)
    zw = _window_fold(z_step, K, L, 0)
    vw = _window_fold(v_step, K, L, 0)
    evw = None
    if is_event is not None:
        evw = _window_fold(is_event[:, :, None], K, L, 0)[:, :, 0]

    x_sol_w, i_sol_w = integrate_dae(
        stepper, de_fn, ae_fn, x0w, tw, zw_full, vw_full, zw, vw,
        is_event=evw, x_true=None, i_true=iw_full,
        remat=remat, unroll=unroll,
    )
    x_solution = _window_unfold(x_sol_w, K, L, B)
    i_solution = _window_unfold(i_sol_w, K, L, B)
    ends = x_sol_w[-1].reshape(K, B, -1)[:-1]
    next_starts = x0w.reshape(K, B, -1)[1:]
    gaps = ends - next_starts
    return x_solution, i_solution, gaps
