"""Fused paths for the direct-encode variants: forward + grad parity vs the
XLA models (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.models import DAEEncodeModel, ODEEncodeModel
from py_psnode_tpu.ops import fused_dae_encode_apply, fused_ode_encode_apply


def _ode_setup(rng, B=3, T=8, xd=2, zd=2, h=8, solver="euler"):
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    batch = dict(
        t=jnp.asarray(t),
        x=jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32)),
        z=jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32)),
    )
    event_t = np.full((B, 2), -1.0, f32)
    for b in range(B):
        event_t[b, 0] = t[b, 2 + b % 3, 0]
    batch["event_t"] = jnp.asarray(event_t)
    batch["z_jump"] = jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32))
    model = ODEEncodeModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver=solver)
    args = tuple(batch[k] for k in ("t", "x", "z", "event_t", "z_jump"))
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args, h


def _dae_setup(rng, B=3, T=8, xd=2, zd=1, vd=2, idim=2, h=8, solver="euler"):
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    batch = dict(
        t=jnp.asarray(t),
        x=jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32)),
        z=jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32)),
        v=jnp.asarray(rng.normal(size=(B, T, vd)).astype(f32)),
        i=jnp.asarray(rng.normal(size=(B, T, idim)).astype(f32)),
    )
    event_t = np.full((B, 2), -1.0, f32)
    for b in range(B):
        event_t[b, 0] = t[b, 2 + b % 3, 0]
    batch["event_t"] = jnp.asarray(event_t)
    batch["z_jump"] = jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32))
    batch["v_jump"] = jnp.asarray(rng.normal(size=(B, 2, vd)).astype(f32))
    model = DAEEncodeModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver=solver
    )
    keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
    args = tuple(batch[k] for k in keys)
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args, (xd, zd, vd, idim), h


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_ode_encode_forward_parity(rng, solver):
    model, params, batch, args, h = _ode_setup(rng, solver=solver)
    ref_pred, ref_re = model.apply(params, *args)
    got_pred, got_re = fused_ode_encode_apply(
        params, batch, h, solver=solver, interpret=True
    )
    np.testing.assert_allclose(np.array(got_pred), np.array(ref_pred), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(got_re), np.array(ref_re), rtol=2e-4, atol=1e-5)


def test_ode_encode_grad_parity(rng):
    model, params, batch, args, h = _ode_setup(rng)
    target = jnp.asarray(rng.normal(size=np.array(batch["x"]).shape).astype(np.float32))

    def loss_xla(p):
        pred, re = model.apply(p, *args)
        return jnp.sum((pred - target) ** 2) + jnp.sum(re**2)

    def loss_fused(p):
        pred, re = fused_ode_encode_apply(p, batch, h, solver="euler", interpret=True)
        return jnp.sum((pred - target) ** 2) + jnp.sum(re**2)

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


@pytest.mark.parametrize("solver", ["euler", "rk4"])
@pytest.mark.parametrize("zd", [1, 0])
def test_dae_encode_forward_parity(rng, solver, zd):
    model, params, batch, args, dims, h = _dae_setup(rng, zd=zd, solver=solver)
    if zd == 0:
        batch = dict(batch, z=batch["z"][:, :, :0], z_jump=batch["z_jump"][:, :, :0])
        args = tuple(
            batch[k] for k in ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
        )
        model = DAEEncodeModel(x_dim=2, z_dim=0, v_dim=2, i_dim=2, hidden_dim=h, solver=solver)
        params = model.init(jax.random.PRNGKey(0), *args)
        dims = (2, 0, 2, 2)
    ref = model.apply(params, *args)
    got = fused_dae_encode_apply(params, batch, dims, h, solver=solver, interpret=True)
    for r, g, name in zip(ref, got, ("x_pred", "i_pred", "x_re", "i_re")):
        np.testing.assert_allclose(
            np.array(g), np.array(r), rtol=3e-4, atol=2e-5, err_msg=name
        )


def test_dae_encode_grad_parity(rng):
    model, params, batch, args, dims, h = _dae_setup(rng)
    xt = jnp.asarray(rng.normal(size=np.array(batch["x"]).shape).astype(np.float32))
    it = jnp.asarray(rng.normal(size=np.array(batch["i"]).shape).astype(np.float32))

    def combined(out):
        x_pred, i_pred, x_re, i_re = out
        return (
            jnp.sum((x_pred - xt) ** 2) + jnp.sum((i_pred - it) ** 2)
            + jnp.sum(x_re**2) + 0.3 * jnp.sum(i_re**2)
        )

    lx, gx = jax.value_and_grad(lambda p: combined(model.apply(p, *args)))(params)
    lf, gf = jax.value_and_grad(
        lambda p: combined(
            fused_dae_encode_apply(p, batch, dims, h, solver="euler", interpret=True)
        )
    )(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(gx), jax.tree_util.tree_leaves(gf)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-3, atol=3e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
