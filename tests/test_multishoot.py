"""Multi-shooting and sqrt-remat tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.solvers import integrate_ode
from py_psnode_tpu.solvers.multishoot import (
    multishoot_dae,
    multishoot_ode,
    tile_batch,
)


def _problem(rng, T=25, B=3, xd=2, zd=2):
    W1 = rng.normal(size=(xd, xd)) * 0.4
    W2 = rng.normal(size=(zd, xd)) * 0.4
    f = lambda tt, xx, zz: jnp.tanh(xx @ jnp.asarray(W1) + zz @ jnp.asarray(W2))
    t = jnp.asarray(np.cumsum(np.full((T, B, 1), 0.02), axis=0) - 0.02)
    x = jnp.asarray(rng.normal(size=(T, B, xd)))
    z = jnp.asarray(rng.normal(size=(T, B, zd)))
    return f, t, x, z


def test_k1_equals_plain(rng):
    f, t, x, z = _problem(rng)
    plain = integrate_ode("rk4", f, t, x, z[:-1], remat=False)
    ms, gaps = multishoot_ode("rk4", f, t, x, z[:-1], n_windows=1, remat=False)
    np.testing.assert_allclose(np.array(ms), np.array(plain), rtol=1e-10)
    assert gaps.shape[0] == 0


def test_windows_match_teacher_started_segments(rng):
    """Each window's rollout must equal a plain solve started from the true
    state at the window boundary."""
    f, t, x, z = _problem(rng, T=25)
    K, L = 4, 6
    ms, gaps = multishoot_ode("euler", f, t, x, z[:-1], n_windows=K, remat=False)
    for w in range(K):
        seg = integrate_ode(
            "euler", f,
            t[w * L : w * L + L + 1],
            x[w * L : w * L + L + 1],
            z[w * L : w * L + L],
            remat=False,
        )
        # stitched boundary point w*L belongs to the PREVIOUS window's
        # rollout; the window itself restarts from the true state — compare
        # the interior points each window produced
        np.testing.assert_allclose(
            np.array(ms[w * L + 1 : w * L + L + 1]), np.array(seg[1:]),
            rtol=1e-6, err_msg=f"window {w}",
        )
    # gap definition
    seg0 = integrate_ode(
        "euler", f, t[:L + 1], x[:L + 1], z[:L], remat=False
    )
    np.testing.assert_allclose(
        np.array(gaps[0]), np.array(seg0[-1] - x[L]), rtol=1e-6
    )


def test_indivisible_raises(rng):
    f, t, x, z = _problem(rng, T=25)
    with pytest.raises(ValueError):
        multishoot_ode("euler", f, t, x, z[:-1], n_windows=5)


def test_multishoot_dae_k1_matches(rng):
    from py_psnode_tpu.solvers import integrate_dae

    T, B, xd, zd, vd, idim = 13, 2, 2, 1, 2, 2
    J = jnp.asarray
    Wx = J(rng.normal(size=(xd, xd)) * 0.3)
    Gz = J(rng.normal(size=(zd, idim)) * 0.3)
    Gx = J(rng.normal(size=(xd, idim)) * 0.3)
    Iz = J(rng.normal(size=(zd + vd + idim, xd)) * 0.3)
    f = lambda tt, xx, zz, vv, ii: jnp.tanh(xx @ Wx) + 0.1 * ii.sum(-1, keepdims=True)
    g = lambda xx, zz, vv: jnp.tanh(xx @ Gx + zz @ Gz)
    init_fn = lambda z0, v0, i0: jnp.concatenate([z0, v0, i0], -1) @ Iz

    t = J(np.cumsum(np.full((T, B, 1), 0.02), axis=0) - 0.02)
    z = J(rng.normal(size=(T, B, zd)))
    v = J(rng.normal(size=(T, B, vd)))
    i = J(rng.normal(size=(T, B, idim)))
    x0 = init_fn(z[0], v[0], i[0])
    plain_x, plain_i = integrate_dae(
        "euler", f, g, x0, t, z, v, z[:-1], v[:-1], remat=False
    )
    ms_x, ms_i, gaps = multishoot_dae(
        "euler", f, g, x0, t, z, v, i, z[:-1], v[:-1], 1, remat=False
    )
    np.testing.assert_allclose(np.array(ms_x), np.array(plain_x), rtol=1e-6)
    np.testing.assert_allclose(np.array(ms_i), np.array(plain_i), rtol=1e-6)
    # K=4: caller-supplied window starts (window 0 = x0, rest arbitrary)
    L = (T - 1) // 4
    starts = jnp.concatenate(
        [x0[None]]
        + [init_fn(z[w * L], v[w * L], i[w * L])[None] for w in range(1, 4)],
        0,
    )  # [K, B, xd]
    ms_x4, ms_i4, gaps4 = multishoot_dae(
        "euler", f, g, starts.reshape(4 * B, xd), t, z, v, i, z[:-1], v[:-1],
        4, remat=False,
    )
    assert gaps4.shape == (3, B, xd)
    # gap[0] = window-0 rollout end (the stitched boundary point) minus the
    # supplied start of window 1
    np.testing.assert_allclose(
        np.array(gaps4[0]),
        np.array(ms_x4[L] - starts[1]),
        rtol=1e-6, atol=1e-12,
    )


def test_sqrt_remat_matches(rng):
    f, t, x, z = _problem(rng, T=30)

    def loss(w, remat):
        ff = lambda tt, xx, zz: jnp.tanh(xx * w) + zz
        sol = integrate_ode("rk4", ff, t, x[:, :, :1], z[:-1, :, :1], remat=remat)
        return jnp.sum(sol**2)

    for w in (0.3,):
        l_true = float(loss(w, True))
        l_sqrt = float(loss(w, "sqrt"))
        np.testing.assert_allclose(l_sqrt, l_true, rtol=1e-10)
        g_true = float(jax.grad(loss)(w, True))
        g_sqrt = float(jax.grad(loss)(w, "sqrt"))
        np.testing.assert_allclose(g_sqrt, g_true, rtol=1e-8)


def _ode_model_batch(rng, B=4, T=13, xd=2, zd=1, h=8):
    from py_psnode_tpu.models import ODEModel

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
    model = ODEModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver="euler")
    args = tuple(batch[k] for k in ("t", "x", "z", "event_t", "z_jump"))
    params = model.init(jax.random.PRNGKey(0), *args)
    return params, batch, xd, h


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_fused_multishoot_ode_grad_parity(rng, solver):
    """Fused (Pallas, interpret) multishoot == XLA multishoot: outputs, gaps,
    and gradients."""
    from py_psnode_tpu.train.multishoot_forward import (
        fused_multishoot_ode_apply,
        multishoot_ode_apply,
    )

    params, batch, xd, h = _ode_model_batch(rng, T=13)
    K = 4

    def loss(p, fused):
        fn = fused_multishoot_ode_apply if fused else multishoot_ode_apply
        kw = dict(interpret=True) if fused else dict(remat=False)
        out, gaps = fn(p, batch, xd, h, K, solver=solver, **kw)
        return jnp.sum(out**2) + jnp.sum(gaps**2)

    l_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


@pytest.mark.parametrize("solver", ["euler", "rk4_38"])
def test_fused_multishoot_dae_grad_parity(rng, solver):
    """Same for the DAE family (events included); also exercises the
    rk4_38 → rk4 fused-solver alias."""
    from test_fused_dae import _setup
    from py_psnode_tpu.train.multishoot_forward import (
        fused_multishoot_dae_apply,
        multishoot_dae_apply,
    )

    model, params, batch, args, dims5 = _setup(rng, B=3, T=9, h=8)
    dims, h = dims5[:4], dims5[4]
    K = 4

    def loss(p, fused):
        fn = fused_multishoot_dae_apply if fused else multishoot_dae_apply
        kw = dict(interpret=True) if fused else dict(remat=False)
        (x_sol, i_sol), gaps = fn(p, batch, dims, h, K, solver=solver, **kw)
        return jnp.sum(x_sol**2) + 0.5 * jnp.sum(i_sol**2) + jnp.sum(gaps**2)

    l_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def _enc_ode_setup(rng, B=3, T=9, xd=2, zd=2, h=8, solver="euler"):
    from py_psnode_tpu.models import ODEEncodeModel

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
    model = ODEEncodeModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver=solver)
    args = tuple(batch[k] for k in ("t", "x", "z", "event_t", "z_jump"))
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args, h


def test_multishoot_ode_encode_k1_equals_model(rng):
    """K=1 latent multishoot == the plain ODEEncodeModel forward (window 0
    starts from the encoded true x0, exactly like the model)."""
    from py_psnode_tpu.train.multishoot_forward import multishoot_ode_encode_apply

    model, params, batch, args, h = _enc_ode_setup(rng)
    x_ref, xre_ref = model.apply(params, *args)
    (x_ms, xre_ms), gaps = multishoot_ode_encode_apply(
        params, batch, h, 1, solver="euler", remat=False
    )
    assert gaps.shape[0] == 0
    np.testing.assert_allclose(np.asarray(x_ms), np.asarray(x_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xre_ms), np.asarray(xre_ref), rtol=1e-6)


def test_fused_multishoot_ode_encode_grad_parity(rng):
    from py_psnode_tpu.train.multishoot_forward import (
        fused_multishoot_ode_encode_apply,
        multishoot_ode_encode_apply,
    )

    model, params, batch, args, h = _enc_ode_setup(rng, T=9)
    K = 4

    def loss(p, fused):
        fn = fused_multishoot_ode_encode_apply if fused else multishoot_ode_encode_apply
        kw = dict(interpret=True) if fused else dict(remat=False)
        (x_pred, x_re), gaps = fn(p, batch, h, K, solver="euler", **kw)
        return jnp.sum(x_pred**2) + jnp.sum(x_re**2) + jnp.sum(gaps**2)

    l_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def _enc_dae_setup(rng, B=3, T=9, h=8, solver="euler"):
    from test_fused_dae import _setup
    from py_psnode_tpu.models import DAEEncodeModel

    _, _, batch, _, dims5 = _setup(rng, B=B, T=T, h=h, solver=solver)
    xd, zd, vd, idim = dims5[:4]
    model = DAEEncodeModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver=solver
    )
    keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
    args = tuple(batch[k] for k in keys)
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args, dims5[:4], h


def test_multishoot_dae_encode_k1_equals_model(rng):
    from py_psnode_tpu.train.multishoot_forward import multishoot_dae_encode_apply

    model, params, batch, args, dims, h = _enc_dae_setup(rng)
    ref = model.apply(params, *args)
    out, gaps = multishoot_dae_encode_apply(
        params, batch, dims, h, 1, solver="euler", remat=False
    )
    assert gaps.shape[0] == 0
    for got, want in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )


def test_fused_multishoot_dae_encode_grad_parity(rng):
    from py_psnode_tpu.train.multishoot_forward import (
        fused_multishoot_dae_encode_apply,
        multishoot_dae_encode_apply,
    )

    model, params, batch, args, dims, h = _enc_dae_setup(rng)
    K = 4

    def loss(p, fused):
        fn = (
            fused_multishoot_dae_encode_apply
            if fused
            else multishoot_dae_encode_apply
        )
        kw = dict(interpret=True) if fused else dict(remat=False)
        (x_pred, i_pred, x_re, i_re), gaps = fn(
            p, batch, dims, h, K, solver="euler", **kw
        )
        return (
            jnp.sum(x_pred**2) + 0.5 * jnp.sum(i_pred**2)
            + jnp.sum(x_re**2) + jnp.sum(i_re**2) + jnp.sum(gaps**2)
        )

    l_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_f, g_f = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_fused_solver_alias_and_rejects():
    from py_psnode_tpu.ops.fused_dae import normalize_solver

    assert normalize_solver("rk4_38") == "rk4"
    assert normalize_solver("RK4") == "rk4"
    with pytest.raises(ValueError, match="euler"):
        normalize_solver("dopri5")


def test_tile_batch():
    a = jnp.arange(6).reshape(2, 3)
    out = tile_batch(a, 2)
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(np.array(out[2]), np.array(a[0]))


def _cw_setup(rng, kind, B=3, T=9, xd=2, zd=1, vd=2, idim=2, h=8,
              solver="euler"):
    from py_psnode_tpu.models import ChannelWiseDAEModel, ChannelWiseODEModel

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
    if kind == "dae":
        batch.update(
            v=jnp.asarray(rng.normal(size=(B, T, vd)).astype(f32)),
            i=jnp.asarray(rng.normal(size=(B, T, idim)).astype(f32)),
            v_jump=jnp.asarray(rng.normal(size=(B, 2, vd)).astype(f32)),
        )
        model = ChannelWiseDAEModel(x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim,
                                    hidden_dim=h, solver=solver)
        keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
    else:
        model = ChannelWiseODEModel(x_dim=xd, z_dim=zd, hidden_dim=h,
                                    solver=solver)
        keys = ("t", "x", "z", "event_t", "z_jump")
    args = tuple(batch[k] for k in keys)
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args


def test_multishoot_cw_ode_k1_equals_model(rng):
    """K=1 channel-wise multishoot == the plain ChannelWiseODEModel forward
    (window 0 starts from the per-channel-encoded true x0, exactly like the
    model)."""
    from py_psnode_tpu.train.multishoot_forward import multishoot_cw_ode_apply

    model, params, batch, args = _cw_setup(rng, "ode")
    x_ref, xre_ref = model.apply(params, *args)
    (x_ms, xre_ms), gaps = multishoot_cw_ode_apply(
        params, batch, 2, 1, 8, 1, solver="euler", remat=False
    )
    assert gaps.shape[0] == 0
    np.testing.assert_allclose(np.asarray(x_ms), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xre_ms), np.asarray(xre_ref),
                               rtol=1e-6)


def test_multishoot_cw_dae_k1_equals_model(rng):
    from py_psnode_tpu.train.multishoot_forward import multishoot_cw_dae_apply

    model, params, batch, args = _cw_setup(rng, "dae")
    x_ref, i_ref, xre_ref = model.apply(params, *args)
    (x_ms, i_ms, xre_ms), gaps = multishoot_cw_dae_apply(
        params, batch, (2, 1, 2, 2), 8, 1, solver="euler", remat=False
    )
    assert gaps.shape[0] == 0
    np.testing.assert_allclose(np.asarray(x_ms), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(i_ms), np.asarray(i_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xre_ms), np.asarray(xre_ref),
                               rtol=1e-6)


def test_multishoot_cw_windows_reduce_gaps_grad(rng):
    """K>1 channel-wise multishoot: gaps exist, and a gap-penalized loss
    differentiates end to end (the training contract)."""
    from py_psnode_tpu.train.multishoot_forward import multishoot_cw_ode_apply

    model, params, batch, args = _cw_setup(rng, "ode")

    def loss(p):
        (x_pred, x_re), gaps = multishoot_cw_ode_apply(
            p, batch, 2, 1, 8, 4, solver="euler", remat=False
        )
        return jnp.sum(x_pred**2) + jnp.sum(x_re**2) + jnp.sum(gaps**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)
