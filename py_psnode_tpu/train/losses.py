"""Per-variant training losses, pinned to the four reference drivers.

All are masked MSE compositions; the subtleties worth pinning (SURVEY.md
§"hard parts"):

  * mask-sum normalization: ``sum(se * mask) / sum(mask)``
    (ref neural_00_ODE_01_no_encode.py:354)
  * ODE-no-encode computes an ``x0`` loss but does NOT add it (ref :353-355)
  * DAE-no-encode upweights the ω channel (dim 1) by an extra ×9 through a
    mask *broadcast* (ref neural_01_DAE_01_no_encode.py:414-417) — the
    broadcast is reproduced, so the effective extra weight follows the mask's
    trailing dimension exactly as in torch
  * DAE-enc forces the decoded initial row to the Init_Func output before the
    loss (handled in the model, ref neural_01_DAE_02_direct_encode.py:150)
  * unmasked initial-step and reconstruction terms use plain MSE means

Each loss returns ``(loss, aux)`` where ``aux`` is a dict of scalar terms for
logging.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def mse(a, b, sample_w=None):
    """Plain MSE mean, optionally weighted over the batch axis.

    With ``sample_w`` (``[B]`` of 0/1), padded rows contribute nothing and the
    result equals the plain mean over the real rows — so padding batches to a
    static shape (parallel.pad_batch) leaves every loss term bit-identical in
    expectation to the reference's variable-size last batch.
    """
    se = (a - b) ** 2
    if sample_w is None:
        return jnp.mean(se)
    w = sample_w.reshape((-1,) + (1,) * (se.ndim - 1))
    per_row = int(np.prod(se.shape[1:])) if se.ndim > 1 else 1
    return jnp.sum(se * w) / (jnp.sum(sample_w) * per_row)


def masked_sum_se(pred, true, mask):
    """``sum(se * mask) / sum(mask)`` — the reference's masked normalization."""
    return jnp.sum((pred - true) ** 2 * mask) / jnp.sum(mask)


def ode_no_encode_loss(x_pred, batch) -> Tuple[jnp.ndarray, Dict]:
    """ref neural_00_ODE_01_no_encode.py:353-355 — per-dim masked loss summed;
    x0_loss computed but intentionally NOT added."""
    x, mask = batch["x"], batch["mask"]
    se = (x_pred - x) ** 2 * mask
    x_loss_vec = jnp.sum(se, axis=(0, 1)) / jnp.sum(mask)
    x_loss = jnp.sum(x_loss_vec)
    x0_loss = mse(x[:, 0, :], x_pred[:, 0, :], batch.get("sample_w"))
    return x_loss, {"x_loss": x_loss, "x0_loss": x0_loss, "loss": x_loss}


def ode_encode_loss(outputs, batch) -> Tuple[jnp.ndarray, Dict]:
    """ref neural_00_ODE_02_direct_encode.py:267-270 — adds x0 + recon."""
    x_pred, x_re = outputs
    x, mask = batch["x"], batch["mask"]
    w = batch.get("sample_w")
    x_loss = jnp.sum(jnp.sum((x_pred - x) ** 2 * mask, axis=(0, 1)) / jnp.sum(mask))
    x0_loss = mse(x[:, 0, :], x_pred[:, 0, :], w)
    recon = mse(x_re, x, w)
    loss = x0_loss + x_loss + recon
    return loss, {
        "x_loss": x_loss,
        "x0_loss": x0_loss,
        "recon_loss": recon,
        "loss": loss,
    }


def dae_no_encode_loss(outputs, batch, omega_extra_weight: float = 9.0):
    """ref neural_01_DAE_01_no_encode.py:414-419 — ω (dim 1) upweighted via a
    broadcast extra term; plus i_loss and unmasked x0/i0 terms."""
    x_pred, i_pred = outputs
    x, i, mask = batch["x"], batch["i"], batch["mask"]
    w = batch.get("sample_w")
    se_x = (x_pred - x) ** 2
    x_loss = (
        jnp.sum(se_x * mask)
        + jnp.sum(se_x[:, :, 1:2] * mask) * omega_extra_weight
    ) / jnp.sum(mask)
    i_loss = jnp.sum((i_pred - i) ** 2 * mask) / jnp.sum(mask)
    x0_loss = mse(x[:, 0, :], x_pred[:, 0, :], w)
    i0_loss = mse(i[:, 0, :], i_pred[:, 0, :], w)
    loss = x_loss + i_loss + x0_loss + i0_loss
    return loss, {"x_loss": x_loss, "i_loss": i_loss, "loss": loss}


def dae_encode_loss(outputs, batch):
    """ref neural_01_DAE_02_direct_encode.py:359-365."""
    x_pred, i_pred, x_re, i_re = outputs
    x, i, mask = batch["x"], batch["i"], batch["mask"]
    w = batch.get("sample_w")
    x_loss = jnp.sum((x_pred - x) ** 2 * mask) / jnp.sum(mask)
    i_loss = jnp.sum((i_pred - i) ** 2 * mask) / jnp.sum(mask)
    recon = mse(x_re, x, w) + mse(i_re, i, w)
    x0_loss = mse(x[:, 0, :], x_pred[:, 0, :], w)
    i0_loss = mse(i[:, 0, :], i_pred[:, 0, :], w)
    loss = x_loss + i_loss + x0_loss + i0_loss + recon
    return loss, {
        "x_loss": x_loss,
        "i_loss": i_loss,
        "recon_loss": recon,
        "loss": loss,
    }


def ode_channelwise_loss(outputs, batch) -> Tuple[jnp.ndarray, Dict]:
    """Channel-wise ODE family (repaired neural_base.py:68-133). The
    reference never wired this family into a driver, so there is no loss to
    pin; we follow the direct-encode recipe (the family is an autoencoding
    design): masked x_loss + x0 + reconstruction."""
    return ode_encode_loss(outputs, batch)


def dae_channelwise_loss(outputs, batch):
    """Channel-wise DAE family (repaired neural_base.py:199-255). No
    reference driver exists; composition follows the DAE-encode recipe minus
    the i-reconstruction (this family has no i-autoencoder — ``i`` is a pure
    readout): masked x/i losses + unmasked x0/i0 + x reconstruction."""
    x_pred, i_pred, x_re = outputs
    x, i, mask = batch["x"], batch["i"], batch["mask"]
    w = batch.get("sample_w")
    x_loss = jnp.sum((x_pred - x) ** 2 * mask) / jnp.sum(mask)
    i_loss = jnp.sum((i_pred - i) ** 2 * mask) / jnp.sum(mask)
    recon = mse(x_re, x, w)
    x0_loss = mse(x[:, 0, :], x_pred[:, 0, :], w)
    i0_loss = mse(i[:, 0, :], i_pred[:, 0, :], w)
    loss = x_loss + i_loss + x0_loss + i0_loss + recon
    return loss, {
        "x_loss": x_loss,
        "i_loss": i_loss,
        "recon_loss": recon,
        "loss": loss,
    }


def robust_time_series_loss(loss: jnp.ndarray, limit_loss=None):
    """Branchless equivalent of ``Losses.multi_time_series_loss``
    (ref utils.py:29-42), quirks included: with ``limit_loss`` unset, EVERY
    element >= 1e-6 is replaced by its gradient-direction-preserving
    normalization ``loss / stop_grad(loss)`` (i.e. pinned to 1.0 in value);
    with ``limit_loss`` set, the raw sum passes through only in the band
    where some element exceeds 1 but none exceeds the limit. NaN anywhere
    → zero-gradient zero.

    This is the verbatim parity surface. Because the always-normalize
    branch degenerates a SCALAR training loss, ``TrainConfig.robust_loss``
    wires a scalar adaptation instead (normalize only above
    ``robust_limit``, see trainer.py) rather than calling this function.

    The reference logs the anomaly; here the caller can detect it via the
    returned flag.
    """
    import jax

    nan_el = jnp.isnan(loss)
    nan = jnp.any(nan_el)
    # double-where guards: never let a NaN or 0/0 sit in an untaken branch
    safe = jnp.where(nan_el, 0.0, loss)
    small = safe < 1.0e-6
    denom = jnp.where(small, 1.0, jax.lax.stop_gradient(safe))
    normalized = jnp.where(small, safe, safe / denom)
    if limit_loss is None:
        out = jnp.sum(normalized)
    else:
        too_big = jnp.any(safe > limit_loss)
        any_over_one = jnp.any(safe > 1.0)
        out = jnp.where(
            any_over_one,
            jnp.where(too_big, jnp.sum(normalized), jnp.sum(safe)),
            jnp.sum(normalized),
        )
    out = jnp.where(nan, 0.0, out)
    return out, nan
