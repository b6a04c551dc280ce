"""Branchless disturbance-event handling.

The reference handles events with stateful Python objects and per-step
membership tests inside the time loop (``neural_base.py:43-65,169-196`` and
``my_solvers.py:70-72,108-110``): at a step starting at ``t0``, if ``t0`` is in
the event schedule, the exogenous input used for that one step is replaced by
a stored post-jump value. Two reference limitations are deliberately fixed
here:

  * the reference reads the schedule of *batch element 0 only*
    (``neural_base.py:54``) — we apply every sample's own schedule;
  * Python-level branching inside the loop would break ``jax.lax.scan``
    compilation — we precompute a *jumped input stream* with ``jnp.where`` so
    the scan body is branch-free.

Convention (matches the reference ``.npz`` schema, §2.7 of SURVEY.md):
  * ``t``        — ``[B, T, 1]`` time grid
  * ``event_t``  — ``[B, E]`` event times; entries that match no grid time are
    inert, so any sentinel (e.g. ``-1``) is safe padding
  * ``*_jump``   — ``[B, E, D]`` post-jump input values, one per event

The reference tests membership with exact float equality (``t0[0] in
self.event_t[0]``, ``neural_base.py:54``); we pin the same exact-match
semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def event_match(t: jnp.ndarray, event_t: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match grid times against per-sample event schedules.

    Args:
      t: ``[B, T, 1]`` (or ``[B, T]``) time grid.
      event_t: ``[B, E]`` event times, or None.

    Returns:
      ``(is_event, e_idx)`` with ``is_event: [B, T]`` bool (True where the
      grid time equals some event time) and ``e_idx: [B, T]`` int32 index of
      the first matching event (0 where no match).
    """
    tt = t[..., 0] if t.ndim == 3 else t  # [B, T]
    if event_t is None or event_t.shape[-1] == 0:
        z = jnp.zeros(tt.shape, dtype=jnp.int32)
        return jnp.zeros(tt.shape, dtype=bool), z
    match = tt[:, :, None] == event_t[:, None, :]  # [B, T, E]
    is_event = jnp.any(match, axis=-1)
    e_idx = jnp.argmax(match, axis=-1).astype(jnp.int32)
    return is_event, e_idx


def jumped_stream(
    stream: jnp.ndarray,
    jump: Optional[jnp.ndarray],
    is_event: jnp.ndarray,
    e_idx: jnp.ndarray,
) -> jnp.ndarray:
    """Replace ``stream[b, j]`` by ``jump[b, e_idx[b, j]]`` where an event fires.

    Args:
      stream: ``[B, T, D]`` exogenous input stream.
      jump: ``[B, E, D]`` post-jump values (or None → stream unchanged).
      is_event / e_idx: from :func:`event_match`.

    Returns:
      ``[B, T, D]`` stream with event steps substituted. This is exactly the
      input the reference's ``jump_change_fn`` would have supplied at each
      event step (``neural_base.py:59-65,187-196``), generalized per-sample.
    """
    if jump is None or jump.size == 0:
        return stream
    sel = jnp.take_along_axis(jump, e_idx[:, :, None], axis=1)  # [B, T, D]
    return jnp.where(is_event[:, :, None], sel, stream)
