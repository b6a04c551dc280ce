"""Fused Pallas ODE rollout: forward + gradient parity vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.models import ODEModel
from py_psnode_tpu.ops.fused_ode import fused_ode_apply


def _setup(rng, B=4, T=9, xd=2, zd=2, h=8, solver="euler", with_events=True):
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    batch = dict(
        t=jnp.asarray(t),
        x=jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32)),
        z=jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32)),
    )
    event_t = np.full((B, 2), -1.0, f32)
    if with_events:
        for b in range(B):
            event_t[b, 0] = t[b, 2 + b % 3, 0]
    batch["event_t"] = jnp.asarray(event_t)
    batch["z_jump"] = jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32))
    model = ODEModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver=solver)
    args = tuple(batch[k] for k in ("t", "x", "z", "event_t", "z_jump"))
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args


@pytest.mark.parametrize("solver", ["euler", "rk4"])
@pytest.mark.parametrize("with_events", [False, True])
def test_forward_parity(rng, solver, with_events):
    model, params, batch, args = _setup(
        rng, solver=solver, with_events=with_events
    )
    ref = model.apply(params, *args)
    got = fused_ode_apply(params, batch, x_dim=2, solver=solver, interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(ref), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_grad_parity(rng, solver):
    model, params, batch, args = _setup(rng, solver=solver)
    target = jnp.asarray(
        rng.normal(size=np.array(batch["x"]).shape).astype(np.float32)
    )

    def loss_xla(p):
        return jnp.sum((model.apply(p, *args) - target) ** 2)

    def loss_fused(p):
        out = fused_ode_apply(p, batch, x_dim=2, solver=solver, interpret=True)
        return jnp.sum((out - target) ** 2)

    lx, gx = jax.value_and_grad(loss_xla)(params)
    lf, gf = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(gx), jax.tree_util.tree_leaves(gf)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_multi_batch_block(rng):
    import py_psnode_tpu.ops.fused_dae as fd

    model, params, batch, args = _setup(rng, B=8, solver="rk4")
    ref = model.apply(params, *args)
    orig = fd.choose_blocks
    fd.choose_blocks = lambda B, *a, **kw: (4, 2)  # force nB=2, tb=2
    try:
        got = fused_ode_apply(params, batch, x_dim=2, solver="rk4", interpret=True)
    finally:
        fd.choose_blocks = orig
    np.testing.assert_allclose(np.array(got), np.array(ref), rtol=2e-4, atol=1e-5)


def test_midpoint_parity(rng):
    model, params, batch, args = _setup(rng, solver="midpoint")
    ref = model.apply(params, *args)
    got = fused_ode_apply(params, batch, x_dim=2, solver="midpoint", interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(ref), rtol=2e-4, atol=1e-5)
    target = jnp.asarray(rng.normal(size=np.array(batch["x"]).shape).astype(np.float32))
    gx = jax.grad(lambda p: jnp.sum((model.apply(p, *args) - target) ** 2))(params)
    gf = jax.grad(lambda p: jnp.sum(
        (fused_ode_apply(p, batch, x_dim=2, solver="midpoint", interpret=True) - target) ** 2
    ))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4)
