"""Fused channel-wise kernel parity tests (interpret mode, CPU backend).

Pin: fused_cw_{ode,dae}_apply == ChannelWiseODEModel/ChannelWiseDAEModel
forward AND gradients, for every solver tableau, with events."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _ode_setup(rng, B=4, T=10, xd=2, zd=2, h=8, solver="euler"):
    from py_psnode_tpu.models import ChannelWiseODEModel

    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    event_t = np.full((B, 2), -1.0, f32)
    for b in range(B):
        event_t[b, 0] = t[b, 2 + b % 3, 0]
    batch = dict(
        t=jnp.asarray(t),
        x=jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32)),
        z=jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32)),
        event_t=jnp.asarray(event_t),
        z_jump=jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32)),
    )
    model = ChannelWiseODEModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver=solver)
    args = tuple(batch[k] for k in ("t", "x", "z", "event_t", "z_jump"))
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args, (xd, zd), h


@pytest.mark.parametrize("solver", ["euler", "midpoint", "rk4"])
def test_fused_cw_ode_forward_parity(rng, solver):
    from py_psnode_tpu.ops.fused_channelwise import fused_cw_ode_apply

    model, params, batch, args, dims, h = _ode_setup(rng, solver=solver)
    x_ref, xre_ref = model.apply(params, *args)
    x_f, xre_f = fused_cw_ode_apply(
        params, batch, dims, h, solver=solver, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(x_f), np.asarray(x_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(xre_f), np.asarray(xre_ref), rtol=1e-6
    )


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_fused_cw_ode_grad_parity(rng, solver):
    from py_psnode_tpu.ops.fused_channelwise import fused_cw_ode_apply

    model, params, batch, args, dims, h = _ode_setup(rng, T=9, solver=solver)

    def loss(p, fused):
        if fused:
            out, re = fused_cw_ode_apply(
                p, batch, dims, h, solver=solver, interpret=True
            )
        else:
            out, re = model.apply(p, *args)
        return jnp.sum(out**2) + 0.5 * jnp.sum(re**2)

    l_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-5)
    fx = jax.tree_util.tree_leaves_with_path(g_x)
    ff = jax.tree_util.tree_leaves(g_f)
    for (path, a), b in zip(fx, ff):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def _dae_setup(rng, B=4, T=10, xd=2, zd=1, vd=2, idim=2, h=8, solver="euler"):
    from py_psnode_tpu.models import ChannelWiseDAEModel

    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    event_t = np.full((B, 2), -1.0, f32)
    for b in range(B):
        event_t[b, 0] = t[b, 2 + b % 3, 0]
    batch = dict(
        t=jnp.asarray(t),
        x=jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32)),
        z=jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32)),
        v=jnp.asarray(rng.normal(size=(B, T, vd)).astype(f32)),
        i=jnp.asarray(rng.normal(size=(B, T, idim)).astype(f32)),
        event_t=jnp.asarray(event_t),
        z_jump=jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32)),
        v_jump=jnp.asarray(rng.normal(size=(B, 2, vd)).astype(f32)),
    )
    model = ChannelWiseDAEModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver=solver
    )
    keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
    args = tuple(batch[k] for k in keys)
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args, (xd, zd, vd, idim), h


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_fused_cw_dae_forward_parity(rng, solver):
    from py_psnode_tpu.ops.fused_channelwise import fused_cw_dae_apply

    model, params, batch, args, dims, h = _dae_setup(rng, solver=solver)
    ref = model.apply(params, *args)
    got = fused_cw_dae_apply(
        params, batch, dims, h, solver=solver, interpret=True
    )
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-6
        )


def test_fused_cw_dae_grad_parity(rng):
    from py_psnode_tpu.ops.fused_channelwise import fused_cw_dae_apply

    model, params, batch, args, dims, h = _dae_setup(rng, T=9, solver="rk4")

    def loss(p, fused):
        if fused:
            out = fused_cw_dae_apply(
                p, batch, dims, h, solver="rk4", interpret=True
            )
        else:
            out = model.apply(p, *args)
        x_pred, i_pred, x_re = out
        return (
            jnp.sum(x_pred**2) + 0.5 * jnp.sum(i_pred**2)
            + 0.25 * jnp.sum(x_re**2)
        )

    l_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-5)
    fx = jax.tree_util.tree_leaves_with_path(g_x)
    ff = jax.tree_util.tree_leaves(g_f)
    for (path, a), b in zip(fx, ff):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_cw_uneven_time_blocks(rng):
    """T-1 not divisible by the time block: padded steps are dt=0
    pass-throughs and must not perturb the solution."""
    from py_psnode_tpu.ops.fused_channelwise import fused_cw_ode_apply

    model, params, batch, args, dims, h = _ode_setup(rng, T=12, solver="rk4")
    x_ref, _ = model.apply(params, *args)
    x_f, _ = fused_cw_ode_apply(
        params, batch, dims, h, solver="rk4", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(x_f), np.asarray(x_ref), rtol=1e-5, atol=1e-6
    )
