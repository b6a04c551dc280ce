"""Optimizer construction with reference-parity hyperparameters.

The reference uses ``Adam(lr=5e-3)`` + ``StepLR(step_size=max(epoch/10, 1),
gamma=0.7)`` stepped once per epoch (ref neural_00_ODE_01_no_encode.py:294-295,
388). Two reference quirks, handled deliberately rather than copied:

  * Gradient clipping is applied per-parameter-tensor AFTER ``opt.step()``
    (ref :360-367) and gradients are zeroed before the next backward — so the
    clip has **no effect on optimization** in the reference. We therefore
    default to no clipping, and expose ``per_param_clip`` as an opt-in optax
    transform (applied before the update, i.e. what the reference plausibly
    intended).
  * The logged "gradient norm" is the L2 norm of the vector of per-tensor L1
    norms of the (clipped) gradients (ref :373). :func:`reference_grad_norm`
    reproduces that logged quantity for log parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def steplr_schedule(
    base_lr: float, epochs: int, steps_per_epoch: int, gamma: float = 0.7
):
    """StepLR-equivalent as a per-update schedule.

    lr during (1-indexed) epoch ``e`` is ``base_lr * gamma**((e-1)//size)``
    with ``size = max(epochs // 10, 1)`` — exactly the torch StepLR behavior
    when stepped per epoch.
    """
    size = max(epochs // 10, 1)

    def schedule(count):
        epoch0 = count // steps_per_epoch  # 0-indexed epoch
        return base_lr * gamma ** (epoch0 // size)

    return schedule


def per_param_clip(max_norm: float = 1.0) -> optax.GradientTransformation:
    """Clip each parameter tensor's gradient to L2 norm ``max_norm``."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def clip(g):
            n = jnp.linalg.norm(g.ravel())
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    learning_rate: float = 5e-3,
    epochs: int = 400,
    steps_per_epoch: int = 1,
    sch_gamma: float = 0.7,
    gradient_clip: Optional[float] = None,
    skip_nonfinite: bool = False,
) -> optax.GradientTransformation:
    """Adam + StepLR-equivalent schedule.

    ``skip_nonfinite`` wraps the chain in ``optax.apply_if_finite`` — the
    hardened version of the reference's NaN-loss guard (``utils.py:34-36``):
    a step whose gradients contain NaN/Inf is skipped entirely instead of
    corrupting the parameters (SURVEY.md §5 failure-detection plan).
    """
    sched = steplr_schedule(learning_rate, epochs, steps_per_epoch, sch_gamma)
    chain = []
    if gradient_clip is not None:
        chain.append(per_param_clip(gradient_clip))
    chain.append(optax.adam(sched))
    tx = optax.chain(*chain)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def reference_grad_norm(grads, clip: float = 1.0) -> jnp.ndarray:
    """The reference's logged quantity (ref :363-373): per-tensor L2 clip to
    ``clip``, then L2 norm of the stacked per-tensor L1 norms."""
    leaves = jax.tree_util.tree_leaves(grads)
    if not leaves:
        return jnp.asarray(0.0)

    def leaf_l1(g):
        n2 = jnp.linalg.norm(g.ravel())
        scale = jnp.minimum(1.0, clip / jnp.maximum(n2, 1e-12))
        return jnp.sum(jnp.abs(g * scale))

    l1s = jnp.stack([leaf_l1(g) for g in leaves])
    return jnp.linalg.norm(l1s)


def robust_scalar_guard(loss: jnp.ndarray, limit: float = 1.0):
    """Scalar-loss adaptation of the reference's never-wired robust guard
    (ref utils.py:29-42; see the trainer docstring for why the verbatim
    per-element form is degenerate for a scalar training loss).

    Nonfinite (NaN or +/-inf) -> 0.0 (a zero-gradient zero step);
    ``loss > limit`` -> the direction-preserving normalization
    ``loss / stop_grad(loss)``; otherwise the loss passes through untouched.
    Returns ``(guarded_loss, tripped)``. An inf loss must take the zero-step
    branch, not the over-limit branch: inf/stop_grad(inf) is NaN.

    One definition shared by the trainer and the benchmark suite so the
    committed bench records always measure the guard production trains with.
    """
    nonfinite = ~jnp.isfinite(loss)
    safe = jnp.where(nonfinite, 0.0, loss)
    over = safe > limit
    denom = jax.lax.stop_gradient(jnp.where(over, safe, 1.0))
    guarded = jnp.where(nonfinite, 0.0, jnp.where(over, safe / denom, safe))
    return guarded, jnp.logical_or(nonfinite, over)


def zero_nonfinite_grads(grads):
    """The loss-level NaN guard alone cannot deliver its promised
    "zero-gradient step": a NaN born in the forward rollout reaches the
    cotangents as ``0 * NaN = NaN`` through the ``where()`` (standard JAX
    where-grad pitfall), and one NaN gradient poisons Adam's moments — every
    later step is NaN even though the tripped step's params were frozen.
    Zero the nonfinite gradient entries so the optimizer state advances with
    genuinely zero gradients on a tripped step."""
    return jax.tree_util.tree_map(
        lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
    )
