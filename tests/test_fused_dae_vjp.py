"""Gradient parity for the fused Pallas DAE training path: the custom-VJP
backward kernel must match jax.grad through the XLA scan integrator
(interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_fused_dae import _setup
from py_psnode_tpu.models.funcs import AEFunc, InitFunc
from py_psnode_tpu.ops import precompute_streams
from py_psnode_tpu.ops.fused_dae_vjp import fused_dae_rollout_diff
from py_psnode_tpu.solvers import event_match, jumped_stream


def _fused_loss(model, params, batch, dims, solver, targets):
    """Differentiable scalar loss through the fused rollout. The precompute
    (Init/AE nets, stream projections) stays in XLA and is differentiated by
    JAX; only the rollout runs through the custom-VJP Pallas kernel."""
    xd, zd, vd, idim, h = dims
    tm = lambda a: jnp.swapaxes(a, 0, 1)
    p = params["params"]
    tT = tm(batch["t"]).astype(jnp.float32)
    zT, vT, iT = tm(batch["z"]), tm(batch["v"]), tm(batch["i"])
    is_event, e_idx = event_match(batch["t"], batch["event_t"])
    z_used = tm(jumped_stream(batch["z"], batch["z_jump"], is_event, e_idx))[:-1]
    v_used = tm(jumped_stream(batch["v"], batch["v_jump"], is_event, e_idx))[:-1]
    ev = tm(is_event[:, :, None])[:-1, :, 0]
    x0 = InitFunc((h, h, xd)).apply({"params": p["init_func"]}, zT[0], vT[0], iT[0])
    all_initial = jnp.concatenate([x0, zT[0], vT[0], iT[0]], -1)
    i0 = AEFunc((h, h, h, idim)).apply(
        {"params": p["ae_func"]}, all_initial, x0, zT[0], vT[0]
    )
    streams, weights = precompute_streams(
        p, all_initial, zT, vT, z_used, v_used, (xd, zd, vd, idim)
    )
    dt = tT[1:] - tT[:-1]
    xs, is_ = fused_dae_rollout_diff(
        streams, weights, x0, i0, dt, ev, solver, True
    )
    xt, it = targets
    return jnp.sum((xs - xt) ** 2) + 0.5 * jnp.sum((is_ - it) ** 2)


def _xla_loss(model, params, args, targets):
    x_sol, i_sol = model.apply(params, *args)
    xt, it = targets
    xt_b, it_b = jnp.swapaxes(xt, 0, 1), jnp.swapaxes(it, 0, 1)
    return jnp.sum((x_sol - xt_b) ** 2) + 0.5 * jnp.sum((i_sol - it_b) ** 2)


@pytest.mark.parametrize("solver", ["euler", "rk4"])
@pytest.mark.parametrize("with_events", [False, True])
def test_grad_parity(rng, solver, with_events):
    model, params, batch, args, dims = _setup(
        rng, B=3, T=8, h=8, with_events=with_events, solver=solver
    )
    T, B = batch["t"].shape[1], batch["t"].shape[0]
    xd, zd, vd, idim, h = dims
    targets = (
        jnp.asarray(rng.normal(size=(T, B, xd)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(T, B, idim)).astype(np.float32)),
    )

    l_f, g_f = jax.value_and_grad(
        lambda p: _fused_loss(model, p, batch, dims, solver, targets)
    )(params)
    l_x, g_x = jax.value_and_grad(
        lambda p: _xla_loss(model, p, args, targets)
    )(params)

    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-4)
    flat_f, tree_f = jax.tree_util.tree_flatten(g_f)
    flat_x, tree_x = jax.tree_util.tree_flatten(g_x)
    assert tree_f == tree_x
    paths = jax.tree_util.tree_leaves_with_path(g_x)
    for (path, gx), gf in zip(paths, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_grad_parity_midpoint(rng):
    model, params, batch, args, dims = _setup(
        rng, B=3, T=8, h=8, with_events=True, solver="midpoint"
    )
    T, B = batch["t"].shape[1], batch["t"].shape[0]
    xd, zd, vd, idim, h = dims
    targets = (
        jnp.asarray(rng.normal(size=(T, B, xd)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(T, B, idim)).astype(np.float32)),
    )
    l_f, g_f = jax.value_and_grad(
        lambda p: _fused_loss(model, p, batch, dims, "midpoint", targets)
    )(params)
    l_x, g_x = jax.value_and_grad(
        lambda p: _xla_loss(model, p, args, targets)
    )(params)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-4)
    for (path, gx), gf in zip(
        jax.tree_util.tree_leaves_with_path(g_x), jax.tree_util.tree_leaves(g_f)
    ):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
