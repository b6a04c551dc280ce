"""bf16 kernel compute mode (``precision="bfloat16"``): streams + 2-D
weights are cast at the pallas boundary (fused_dae.cast_compute /
fused_ode._cast_ode), every dot runs bf16×bf16→f32 on the MXU, and biases,
carries and all accumulation stay f32. These interpret-mode tests pin

  * closeness to the f32 kernels (mixed-precision drift only — the bound is
    loose by design, this is an opt-in speed mode), and
  * cotangent dtypes staying f32 (the optimizer state must not downcast).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from test_fused_dae import _setup
from test_fused_dae_vjp import _fused_loss
from py_psnode_tpu.ops.fused_dae_vjp import fused_dae_rollout_diff


def _rel_l2(a_tree, b_tree):
    a, _ = ravel_pytree(a_tree)
    b, _ = ravel_pytree(b_tree)
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-12))


def _loss_with_precision(model, params, batch, dims, solver, targets, prec):
    import test_fused_dae_vjp as V

    orig = V.fused_dae_rollout_diff
    V.fused_dae_rollout_diff = (
        lambda st, w, x0, i0, dt, ev, s, i: orig(
            st, w, x0, i0, dt, ev, s, i, prec
        )
    )
    try:
        return _fused_loss(model, params, batch, dims, solver, targets)
    finally:
        V.fused_dae_rollout_diff = orig


@pytest.mark.parametrize("with_events", [False, True])
def test_dae_bf16_close_to_f32(rng, with_events):
    model, params, batch, args, dims = _setup(
        rng, B=3, T=9, h=8, with_events=with_events, solver="rk4"
    )
    T, B = batch["t"].shape[1], batch["t"].shape[0]
    xd, zd, vd, idim, h = dims
    targets = (
        jnp.asarray(rng.normal(size=(T, B, xd)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(T, B, idim)).astype(np.float32)),
    )
    f32 = lambda p: _loss_with_precision(
        model, p, batch, dims, "rk4", targets, "default"
    )
    bf16 = lambda p: _loss_with_precision(
        model, p, batch, dims, "rk4", targets, "bfloat16"
    )
    l32, g32 = jax.value_and_grad(f32)(params)
    lbf, gbf = jax.value_and_grad(bf16)(params)
    assert abs(float(l32) - float(lbf)) / abs(float(l32)) < 5e-3
    assert _rel_l2(g32, gbf) < 0.05
    # cotangents stay f32 — bf16 is a COMPUTE mode, not a storage mode
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree_util.tree_leaves(gbf)
    )


def test_ode_bf16_close_to_f32(rng):
    from py_psnode_tpu.models import ODEModel
    from py_psnode_tpu.ops.fused_ode import fused_ode_apply

    B, T, xd, zd, h = 3, 9, 2, 2, 8
    f32t = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.01, f32t), axis=1) - 0.01).astype(f32t)
    batch = dict(
        t=jnp.asarray(t),
        x=jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32t)),
        z=jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32t)),
        event_t=jnp.asarray(np.full((B, 2), -1.0, f32t)),
        z_jump=jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32t)),
    )
    model = ODEModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver="rk4")
    params = model.init(
        jax.random.PRNGKey(0), batch["t"], batch["x"], batch["z"],
        batch["event_t"], batch["z_jump"],
    )

    def loss(p, prec):
        xp = fused_ode_apply(
            p, batch, x_dim=xd, solver="rk4", interpret=True, precision=prec
        )
        return jnp.mean(xp ** 2)

    l32, g32 = jax.value_and_grad(lambda p: loss(p, "default"))(params)
    lbf, gbf = jax.value_and_grad(lambda p: loss(p, "bfloat16"))(params)
    assert abs(float(l32) - float(lbf)) / abs(float(l32)) < 5e-3
    assert _rel_l2(g32, gbf) < 0.05
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree_util.tree_leaves(gbf)
    )


def test_trainer_accepts_bf16_fused(tmp_path, rng):
    """cfg.matmul_precision reaches the fused kernels (a 2-iter smoke)."""
    from py_psnode_tpu.data.synthetic import write_smib_dataset
    from py_psnode_tpu.train.trainer import TrainConfig, Trainer

    train_f, test_f = write_smib_dataset(
        tmp_path, n_train=8, n_test=4, n_steps=9
    )
    cfg = TrainConfig(
        variant="dae_no_encode", hidden=8, solver="rk4", fused=True,
        num=8, batch=4, epoch=1, step=9, larger_than=None,
        matmul_precision="bfloat16",
        train_data=str(train_f), test_data=str(test_f),
        model=str(tmp_path / "m"), echo_logs=False,
    )
    Trainer(cfg).train()
    assert (tmp_path / "m" / "model_checkpoint.1").exists()
