"""Model-variant tests: shapes, the skip-augmented input contract, encode
variants' outputs, channel-wise alternate family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.models import (
    DAEEncodeModel,
    DAEModel,
    ChannelWiseAEFunc,
    ChannelWiseDEFunc,
    DEFunc,
    ODEEncodeModel,
    ODEModel,
)


def _ode_batch(rng, B=2, T=7, xd=2, zd=2):
    t = np.cumsum(np.full((B, T, 1), 0.02, np.float32), axis=1) - 0.02
    x = rng.normal(size=(B, T, xd)).astype(np.float32)
    z = rng.normal(size=(B, T, zd)).astype(np.float32)
    event_t = np.full((B, 2), -1.0, np.float32)
    event_t[:, 0] = t[0, 3, 0]
    z_jump = rng.normal(size=(B, 2, zd)).astype(np.float32)
    return jnp.asarray(t), jnp.asarray(x), jnp.asarray(z), jnp.asarray(event_t), jnp.asarray(z_jump)


def _dae_batch(rng, B=2, T=7, xd=2, zd=1, vd=2, idim=2):
    t, x, z, event_t, z_jump = _ode_batch(rng, B, T, xd, zd)
    v = jnp.asarray(rng.normal(size=(B, T, vd)).astype(np.float32))
    i = jnp.asarray(rng.normal(size=(B, T, idim)).astype(np.float32))
    v_jump = jnp.asarray(rng.normal(size=(B, 2, vd)).astype(np.float32))
    return t, x, z, v, i, event_t, z_jump, v_jump


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_ode_model_shapes(rng, solver):
    t, x, z, event_t, z_jump = _ode_batch(rng)
    m = ODEModel(x_dim=2, z_dim=2, hidden_dim=16, solver=solver)
    params = m.init(jax.random.PRNGKey(0), t, x, z, event_t, z_jump)
    out = m.apply(params, t, x, z, event_t, z_jump)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.array(out[:, 0]), np.array(x[:, 0]))


def test_ode_encode_model_shapes(rng):
    t, x, z, event_t, z_jump = _ode_batch(rng)
    m = ODEEncodeModel(x_dim=2, z_dim=2, hidden_dim=8)
    params = m.init(jax.random.PRNGKey(0), t, x, z, event_t, z_jump)
    x_pred, x_re = m.apply(params, t, x, z, event_t, z_jump)
    assert x_pred.shape == x.shape
    assert x_re.shape == x.shape


def test_dae_model_shapes(rng):
    t, x, z, v, i, event_t, z_jump, v_jump = _dae_batch(rng)
    m = DAEModel(x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=16)
    params = m.init(jax.random.PRNGKey(0), t, x, z, v, i, event_t, z_jump, v_jump)
    x_sol, i_sol = m.apply(params, t, x, z, v, i, event_t, z_jump, v_jump)
    assert x_sol.shape == x.shape
    assert i_sol.shape == i.shape


def test_dae_model_pure_latent(rng):
    t, x, z, v, i, event_t, z_jump, v_jump = _dae_batch(rng, xd=2)
    x_empty = x[:, :, :0]
    m = DAEModel(x_dim=0, z_dim=1, v_dim=2, i_dim=2, hidden_dim=16, latent_x_dim=5)
    params = m.init(jax.random.PRNGKey(0), t, x_empty, z, v, i, event_t, z_jump, v_jump)
    x_sol, i_sol = m.apply(params, t, x_empty, z, v, i, event_t, z_jump, v_jump)
    assert x_sol.shape == (x.shape[0], x.shape[1], 5)
    assert i_sol.shape == i.shape


def test_dae_encode_model_shapes_and_init_row(rng):
    t, x, z, v, i, event_t, z_jump, v_jump = _dae_batch(rng)
    m = DAEEncodeModel(x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=8)
    params = m.init(jax.random.PRNGKey(0), t, x, z, v, i, event_t, z_jump, v_jump)
    x_pred, i_pred, x_re, i_re = m.apply(
        params, t, x, z, v, i, event_t, z_jump, v_jump
    )
    assert x_pred.shape == x.shape and i_pred.shape == i.shape
    assert x_re.shape == x.shape and i_re.shape == i.shape
    # ref neural_01_DAE_02_direct_encode.py:150 — initial row is Init_Func output,
    # not the decoded latent
    init_params = {"params": params["params"]["init_func"]}
    from py_psnode_tpu.models.funcs import InitFunc

    x0 = InitFunc((8, 8, 2)).apply(init_params, z[:, 0], v[:, 0], i[:, 0])
    np.testing.assert_allclose(np.array(x_pred[:, 0]), np.array(x0), rtol=1e-5)


def test_dae_encode_zero_z_dim(rng):
    t, x, z, v, i, event_t, z_jump, v_jump = _dae_batch(rng)
    z0 = z[:, :, :0]
    zj0 = z_jump[:, :, :0]
    m = DAEEncodeModel(x_dim=2, z_dim=0, v_dim=2, i_dim=2, hidden_dim=8)
    params = m.init(jax.random.PRNGKey(0), t, x, z0, v, i, event_t, zj0, v_jump)
    x_pred, i_pred, x_re, i_re = m.apply(params, t, x, z0, v, i, event_t, zj0, v_jump)
    assert x_pred.shape == x.shape
    assert "z_encoder" not in params["params"]


def test_defunc_skip_augmented_contract(rng):
    """Pin the input ordering cat(init, u - init, u) by reconstructing the
    forward pass from extracted kernels."""
    xd, zd, h = 2, 3, 4
    de = DEFunc((h, xd))
    x = jnp.asarray(rng.normal(size=(5, xd)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(5, zd)).astype(np.float32))
    init = jnp.asarray(rng.normal(size=(5, xd + zd)).astype(np.float32))
    params = de.init(jax.random.PRNGKey(1), 0.0, init, x, z)
    out = de.apply(params, 0.0, init, x, z)

    p = params["params"]["x_dot"]
    u = np.concatenate([x, z], axis=-1)
    feat = np.concatenate([init, u - init, u], axis=-1)
    h1 = feat @ np.array(p["dense_0"]["kernel"]) + np.array(p["dense_0"]["bias"])
    h1 = np.where(h1 > 0, h1, np.expm1(h1))  # ELU
    expected = h1 @ np.array(p["dense_1"]["kernel"]) + np.array(p["dense_1"]["bias"])
    np.testing.assert_allclose(np.array(out), expected, rtol=1e-5, atol=1e-6)


def test_channelwise_funcs(rng):
    B, xd, zd, vd, idim, h = 3, 2, 2, 2, 2, 8
    de = ChannelWiseDEFunc(x_dim=xd, z_dim=zd, hidden_dim=h)
    x = jnp.asarray(rng.normal(size=(B, xd)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(B, zd)).astype(np.float32))

    def full_init(mdl, x, z):
        xh = mdl.encode_x(x)
        f0 = mdl.features_of(xh, z)
        mdl(0.0, f0, xh, z)
        return mdl.decode_x(xh)

    variables = de.init(jax.random.PRNGKey(0), x, z, method=full_init)
    xh = de.apply(variables, x, method=de.encode_x)
    assert xh.shape == (B, xd, h)
    f0 = de.apply(variables, xh, z, method=de.features_of)
    assert f0.shape == (B, xd + zd, h)
    dot = de.apply(variables, 0.0, f0, xh, z)
    assert dot.shape == (B, xd, h)
    x_dec = de.apply(variables, xh, method=de.decode_x)
    assert x_dec.shape == (B, xd)

    ae = ChannelWiseAEFunc(x_dim=xd, v_dim=vd, i_dim=idim, hidden_dim=h)
    v = jnp.asarray(rng.normal(size=(B, vd)).astype(np.float32))
    vars_ae = ae.init(jax.random.PRNGKey(1), jnp.zeros((B, xd, h)), v)
    y = ae.apply(vars_ae, jnp.zeros((B, xd, h)), v)
    assert y.shape == (B, idim)


def test_channelwise_ode_model(rng):
    from py_psnode_tpu.models import ChannelWiseODEModel
    import jax

    B, T, xd, zd, h = 2, 6, 2, 2, 8
    t = jnp.asarray(np.cumsum(np.full((B, T, 1), 0.02, np.float32), axis=1) - 0.02)
    x = jnp.asarray(rng.normal(size=(B, T, xd)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(B, T, zd)).astype(np.float32))
    event_t = jnp.asarray(np.full((B, 2), -1.0, np.float32)).at[:, 0].set(t[0, 2, 0])
    z_jump = jnp.asarray(rng.normal(size=(B, 2, zd)).astype(np.float32))
    m = ChannelWiseODEModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver="rk4")
    params = m.init(jax.random.PRNGKey(0), t, x, z, event_t, z_jump)
    x_pred, x_re = m.apply(params, t, x, z, event_t, z_jump)
    assert x_pred.shape == x.shape and x_re.shape == x.shape
    assert np.isfinite(np.array(x_pred)).all()
    # gradient flows through the channel-wise scan
    g = jax.grad(lambda p: float(0) + jnp.sum(
        m.apply(p, t, x, z, event_t, z_jump)[0] ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_channelwise_dae_model(rng):
    """End-to-end channel-wise DAE (repaired DAE_Base,
    ref neural_base.py:232-255): shapes, initial rows, decoupled algebraic
    readout, gradients."""
    from py_psnode_tpu.models import ChannelWiseDAEModel
    import jax

    B, T, xd, zd, vd, idim, h = 2, 6, 2, 1, 2, 2, 8
    f32 = np.float32
    t = jnp.asarray(np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02)
    x = jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32))
    z = jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32))
    v = jnp.asarray(rng.normal(size=(B, T, vd)).astype(f32))
    i = jnp.asarray(rng.normal(size=(B, T, idim)).astype(f32))
    event_t = jnp.asarray(np.full((B, 2), -1.0, f32)).at[:, 0].set(t[0, 2, 0])
    z_jump = jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32))
    v_jump = jnp.asarray(rng.normal(size=(B, 2, vd)).astype(f32))
    m = ChannelWiseDAEModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver="rk4"
    )
    args = (t, x, z, v, i, event_t, z_jump, v_jump)
    params = m.init(jax.random.PRNGKey(0), *args)
    x_pred, i_pred, x_re = m.apply(params, *args)
    assert x_pred.shape == x.shape and i_pred.shape == i.shape
    assert x_re.shape == x.shape
    assert np.isfinite(np.array(x_pred)).all() and np.isfinite(np.array(i_pred)).all()
    # x_pred[0] is the encode-decode of the true initial state (this family
    # reads x0 from data — no Init_Func in the reference design)
    np.testing.assert_allclose(
        np.asarray(x_pred[:, 0]), np.asarray(x_re[:, 0]), rtol=1e-5, atol=1e-6
    )
    # the algebraic readout is decoupled: i_pred[t] depends only on the
    # latent state and raw v[t] — perturbing v at step k changes i at k
    # but not x anywhere
    v2 = v.at[:, 3].add(1.0)
    x_pred2, i_pred2, _ = m.apply(params, t, x, z, v2, i, event_t, z_jump, v_jump)
    np.testing.assert_allclose(np.asarray(x_pred2), np.asarray(x_pred), rtol=1e-6)
    assert not np.allclose(np.asarray(i_pred2[:, 3]), np.asarray(i_pred[:, 3]))
    np.testing.assert_allclose(
        np.asarray(i_pred2[:, 2]), np.asarray(i_pred[:, 2]), rtol=1e-6
    )
    g = jax.grad(
        lambda p: jnp.sum(m.apply(p, *args)[0] ** 2)
        + jnp.sum(m.apply(p, *args)[1] ** 2)
    )(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_channelwise_blockdiag_impl_equivalence():
    """PerChannelMLP impl="blockdiag" (one wide block-diagonal matmul) is
    numerically the grouped einsum — off-block weights are exact zeros."""
    import numpy as np

    from py_psnode_tpu.models.channelwise import (
        ChannelWiseDAEModel,
        ChannelWiseODEModel,
    )

    rng = np.random.default_rng(0)
    B, T = 4, 9
    batch = {
        "t": (np.cumsum(np.full((B, T, 1), 0.01), 1) - 0.01).astype(np.float32),
        "x": rng.normal(size=(B, T, 2)).astype(np.float32),
        "z": rng.normal(size=(B, T, 1)).astype(np.float32),
        "event_t": np.full((B, 2), -1.0, np.float32),
        "z_jump": rng.normal(size=(B, 2, 1)).astype(np.float32),
        "v": rng.normal(size=(B, T, 2)).astype(np.float32),
        "i": rng.normal(size=(B, T, 2)).astype(np.float32),
        "v_jump": rng.normal(size=(B, 2, 2)).astype(np.float32),
    }
    oargs = tuple(jnp.asarray(batch[k]) for k in ("t", "x", "z", "event_t", "z_jump"))
    m1 = ChannelWiseODEModel(x_dim=2, z_dim=1, hidden_dim=16)
    m2 = ChannelWiseODEModel(x_dim=2, z_dim=1, hidden_dim=16,
                             channel_impl="blockdiag")
    p = m1.init(jax.random.PRNGKey(0), *oargs)
    for a, b in zip(
        jax.tree_util.tree_leaves(m1.apply(p, *oargs)),
        jax.tree_util.tree_leaves(m2.apply(p, *oargs)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)

    dargs = tuple(jnp.asarray(batch[k]) for k in
                  ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump"))
    d1 = ChannelWiseDAEModel(x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=16)
    d2 = ChannelWiseDAEModel(x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=16,
                             channel_impl="blockdiag")
    pd = d1.init(jax.random.PRNGKey(0), *dargs)
    for a, b in zip(
        jax.tree_util.tree_leaves(d1.apply(pd, *dargs)),
        jax.tree_util.tree_leaves(d2.apply(pd, *dargs)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-6)


def test_torch_style_init_transform():
    """torch_style_init re-draws kernels/biases as torch.nn.Linear's default
    (U(±1/√fan_in), nonzero biases), preserving structure; the model runs."""
    import numpy as np

    from py_psnode_tpu.models import ODEModel
    from py_psnode_tpu.models.initializers import torch_style_init

    rng = np.random.default_rng(0)
    B, T = 4, 9
    batch = {
        "t": (np.cumsum(np.full((B, T, 1), 0.01), 1) - 0.01).astype(np.float32),
        "x": rng.normal(size=(B, T, 2)).astype(np.float32),
        "z": rng.normal(size=(B, T, 2)).astype(np.float32),
        "event_t": np.full((B, 2), -1.0, np.float32),
        "z_jump": rng.normal(size=(B, 2, 2)).astype(np.float32),
    }
    m = ODEModel(x_dim=2, z_dim=2, hidden_dim=16)
    args = tuple(jnp.asarray(batch[k]) for k in ("t", "x", "z", "event_t", "z_jump"))
    p = m.init(jax.random.PRNGKey(0), *args)
    p2 = torch_style_init(p, jax.random.PRNGKey(1))
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)

    def check(d):
        for k, v in d.items():
            if isinstance(v, dict):
                if "kernel" in v and v["kernel"].ndim == 2:
                    bd = 1.0 / np.sqrt(v["kernel"].shape[0]) + 1e-7
                    assert np.abs(v["kernel"]).max() <= bd
                    bmax = np.abs(v["bias"]).max()
                    assert 0 < bmax <= bd  # torch init: NONZERO biases
                else:
                    check(v)

    check(p2["params"] if "params" in p2 else p2)
    out = m.apply(p2, *args)
    assert np.isfinite(np.asarray(out)).all()
