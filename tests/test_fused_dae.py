"""Fused Pallas DAE rollout parity vs the XLA scan path (interpret mode on
the CPU backend; the real-TPU check runs in bench/verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.models import DAEModel
from py_psnode_tpu.ops import fused_dae_rollout, precompute_streams
from py_psnode_tpu.models.funcs import AEFunc, InitFunc
from py_psnode_tpu.solvers import event_match, jumped_stream


def _setup(rng, B=4, T=9, xd=2, zd=1, vd=2, idim=2, h=8, with_events=True, solver="euler"):
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    batch = dict(
        t=jnp.asarray(t),
        x=jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32)),
        z=jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32)),
        v=jnp.asarray(rng.normal(size=(B, T, vd)).astype(f32)),
        i=jnp.asarray(rng.normal(size=(B, T, idim)).astype(f32)),
    )
    if with_events:
        event_t = np.full((B, 2), -1.0, f32)
        for b in range(B):
            event_t[b, 0] = t[b, 2 + b % 3, 0]
        batch["event_t"] = jnp.asarray(event_t)
        batch["z_jump"] = jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32))
        batch["v_jump"] = jnp.asarray(rng.normal(size=(B, 2, vd)).astype(f32))
    else:
        batch["event_t"] = jnp.full((B, 2), -1.0, dtype=jnp.float32)
        batch["z_jump"] = jnp.zeros((B, 2, zd), jnp.float32)
        batch["v_jump"] = jnp.zeros((B, 2, vd), jnp.float32)
    model = DAEModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver=solver
    )
    keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
    args = tuple(batch[k] for k in keys)
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args, (xd, zd, vd, idim, h)


def _fused(model, params, batch, dims, solver, interpret=True):
    xd, zd, vd, idim, h = dims
    tm = lambda a: jnp.swapaxes(a, 0, 1)
    tT = tm(batch["t"]).astype(jnp.float32)
    zT, vT, iT = tm(batch["z"]), tm(batch["v"]), tm(batch["i"])
    is_event, e_idx = event_match(batch["t"], batch["event_t"])
    z_used = tm(jumped_stream(batch["z"], batch["z_jump"], is_event, e_idx))[:-1]
    v_used = tm(jumped_stream(batch["v"], batch["v_jump"], is_event, e_idx))[:-1]
    ev = tm(is_event[:, :, None])[:-1, :, 0]

    p = params["params"]
    x0 = InitFunc((h, h, xd)).apply(
        {"params": p["init_func"]}, zT[0], vT[0], iT[0]
    )
    all_initial = jnp.concatenate([x0, zT[0], vT[0], iT[0]], axis=-1)
    i0 = AEFunc((h, h, h, idim)).apply(
        {"params": p["ae_func"]}, all_initial, x0, zT[0], vT[0]
    )
    streams, weights = precompute_streams(
        p, all_initial, zT, vT, z_used, v_used, (xd, zd, vd, idim)
    )
    dt = (tT[1:] - tT[:-1]).astype(jnp.float32)
    return fused_dae_rollout(
        streams, weights, x0, i0, dt, ev, solver=solver, interpret=interpret
    )


@pytest.mark.parametrize("solver", ["euler", "rk4"])
@pytest.mark.parametrize("with_events", [False, True])
def test_fused_matches_xla(rng, solver, with_events):
    model, params, batch, args, dims = _setup(
        rng, with_events=with_events, solver=solver
    )
    x_ref, i_ref = model.apply(params, *args)  # [B, T, *]
    x_f, i_f = _fused(model, params, batch, dims, solver)
    np.testing.assert_allclose(
        np.array(jnp.swapaxes(x_f, 0, 1)), np.array(x_ref), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.array(jnp.swapaxes(i_f, 0, 1)), np.array(i_ref), rtol=2e-4, atol=1e-5
    )


def test_layer1_split_identity(rng):
    from py_psnode_tpu.ops import split_de_layer1

    d_u, h, B = 7, 8, 5
    W1 = jnp.asarray(rng.normal(size=(3 * d_u, h)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(h,)).astype(np.float32))
    init = jnp.asarray(rng.normal(size=(B, d_u)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, d_u)).astype(np.float32))
    full = jnp.concatenate([init, u - init, u], -1) @ W1 + b1
    Winit, Wu, b = split_de_layer1(W1, b1, d_u)
    lifted = init @ Winit + u @ Wu + b
    np.testing.assert_allclose(np.array(lifted), np.array(full), rtol=1e-4, atol=1e-5)
