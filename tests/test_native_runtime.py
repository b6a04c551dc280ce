"""C++ inference runtime parity: exported DE/AE/Init submodules evaluated by
native/psnode_infer.cpp must match the flax forward bitwise-tolerance."""

import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.export import write_weights_bin, flatten_params
from py_psnode_tpu.models.funcs import AEFunc, Codec, DEFunc, InitFunc

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("make") is None,
    reason="no C++ toolchain",
)


@pytest.fixture(scope="module")
def native():
    from py_psnode_tpu.export.native_runtime import NativeModule, build_library

    build_library()
    return NativeModule


def _roundtrip(native, tmp_path, module, args, name):
    params = module.init(jax.random.PRNGKey(0), *args)
    expected = np.asarray(module.apply(params, *args))
    path = tmp_path / f"{name}.weights.bin"
    write_weights_bin(path, flatten_params(params["params"]))
    return native(path), expected


def test_defunc_parity(native, tmp_path, rng):
    xd, zd, h, B = 2, 3, 16, 5
    de = DEFunc((h, h, h, xd))
    x = jnp.asarray(rng.normal(size=(B, xd)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(B, zd)).astype(np.float32))
    init = jnp.asarray(rng.normal(size=(B, xd + zd)).astype(np.float32))
    mod, expected = _roundtrip(native, tmp_path, de, (0.0, init, x, z), "de")
    assert mod.nets == ["x_dot/"]
    u = np.concatenate([x, z], axis=-1)
    feat = np.concatenate([init, u - init, u], axis=-1)
    got = mod.forward("x_dot/", feat)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)


def test_ae_and_init_parity(native, tmp_path, rng):
    xd, zd, vd, idim, h, B = 2, 1, 2, 2, 16, 4
    ae = AEFunc((h, h, h, idim))
    init_dim = xd + zd + vd + idim
    a = jnp.asarray(rng.normal(size=(B, init_dim)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(B, xd)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(B, zd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, vd)).astype(np.float32))
    mod, expected = _roundtrip(native, tmp_path, ae, (a, x, z, v), "ae")
    feat = np.concatenate([a, x, z, v], axis=-1)
    got = mod.forward("i_calculator/", feat)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)

    inif = InitFunc((h, h, xd))
    i0 = jnp.asarray(rng.normal(size=(B, idim)).astype(np.float32))
    mod2, expected2 = _roundtrip(native, tmp_path, inif, (z, v, i0), "init")
    feat2 = np.concatenate([z, v, i0], axis=-1)
    got2 = mod2.forward("init_fun/", feat2)
    np.testing.assert_allclose(got2, expected2, rtol=2e-5, atol=1e-6)


def test_codec_parity_and_errors(native, tmp_path, rng):
    h, xd, B = 8, 3, 2
    codec = Codec((h, xd))
    x = jnp.asarray(rng.normal(size=(B, h)).astype(np.float32))
    mod, expected = _roundtrip(native, tmp_path, codec, (x,), "codec")
    got = mod.forward("net/", x)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)
    with pytest.raises(RuntimeError):
        mod.forward("nonexistent/", x)
    with pytest.raises(ValueError):
        mod.forward("net/", np.zeros((B, h + 1), np.float32))


@pytest.mark.parametrize("solver", ["euler", "midpoint", "rk4"])
def test_native_ode_rollout_parity(native, tmp_path, rng, solver):
    """The C++ full ODE rollout == ODEModel.apply (no events) — the
    PSOPS-embedding time loop runs entirely in native code."""
    from py_psnode_tpu.export.native_runtime import ode_rollout
    from py_psnode_tpu.models import ODEModel

    B, T, xd, zd, h = 3, 12, 2, 2, 8
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    x = rng.normal(size=(B, T, xd)).astype(f32)
    z = rng.normal(size=(B, T, zd)).astype(f32)
    model = ODEModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver=solver)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(t), jnp.asarray(x), jnp.asarray(z)
    )
    ref = np.asarray(
        model.apply(params, jnp.asarray(t), jnp.asarray(x), jnp.asarray(z))
    )  # [B, T, xd]

    path = tmp_path / "de.weights.bin"
    write_weights_bin(path, flatten_params(params["params"]["de_func"]))
    de = native(path)
    got = ode_rollout(
        de, t[0, :, 0], x[:, 0], np.swapaxes(z, 0, 1), solver=solver
    )  # [T, B, xd]
    np.testing.assert_allclose(
        np.swapaxes(got, 0, 1), ref, rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_native_dae_rollout_parity(native, tmp_path, rng, solver):
    """The C++ full DAE rollout (learned init + lagged-i + algebraic net)
    == DAEModel.apply (no events)."""
    from py_psnode_tpu.export.native_runtime import dae_rollout
    from py_psnode_tpu.models import DAEModel

    B, T, xd, zd, vd, idim, h = 3, 10, 2, 1, 2, 2, 8
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    x = rng.normal(size=(B, T, xd)).astype(f32)
    z = rng.normal(size=(B, T, zd)).astype(f32)
    v = rng.normal(size=(B, T, vd)).astype(f32)
    i = rng.normal(size=(B, T, idim)).astype(f32)
    model = DAEModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver=solver
    )
    args = tuple(jnp.asarray(a) for a in (t, x, z, v, i))
    params = model.init(jax.random.PRNGKey(0), *args)
    x_ref, i_ref = (np.asarray(a) for a in model.apply(params, *args))

    p = params["params"]
    for name in ("de_func", "ae_func", "init_func"):
        write_weights_bin(
            tmp_path / f"{name}.weights.bin", flatten_params(p[name])
        )
    de = native(tmp_path / "de_func.weights.bin")
    ae = native(tmp_path / "ae_func.weights.bin")
    init = native(tmp_path / "init_func.weights.bin")
    x_got, i_got = dae_rollout(
        de, ae, init, t[0, :, 0],
        np.swapaxes(z, 0, 1), np.swapaxes(v, 0, 1), i[:, 0], solver=solver,
    )
    np.testing.assert_allclose(
        np.swapaxes(x_got, 0, 1), x_ref, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.swapaxes(i_got, 0, 1), i_ref, rtol=2e-4, atol=2e-5
    )


def test_native_rollout_bad_solver(native, tmp_path, rng):
    from py_psnode_tpu.export.native_runtime import ode_rollout
    from py_psnode_tpu.models.funcs import DEFunc

    de_mod = DEFunc((8, 8, 8, 2))
    a = jnp.zeros((1, 4), jnp.float32)
    params = de_mod.init(jax.random.PRNGKey(0), 0.0, a, a[:, :2], a[:, :2])
    path = tmp_path / "de.weights.bin"
    write_weights_bin(path, flatten_params(params["params"]))
    de = native(path)
    with pytest.raises(RuntimeError, match="rc=-2"):
        ode_rollout(
            de, np.zeros(3, np.float32), np.zeros((1, 2), np.float32),
            np.zeros((3, 1, 2), np.float32), solver="dopri5",
        )


def test_channelwise_bin_parity(native, tmp_path, rng):
    """Per-channel stacked weights slice into C independent Dense nets in
    the flat-bin (binfmt decision, export.flatten_channelwise) — the
    unchanged C++ runtime must evaluate each channel net to parity."""
    from py_psnode_tpu.export import flatten_channelwise
    from py_psnode_tpu.models.funcs import ChannelWiseAEFunc

    xd, vd, idim, h, B = 2, 2, 2, 8, 3
    ae = ChannelWiseAEFunc(x_dim=xd, v_dim=vd, i_dim=idim, hidden_dim=h)
    xh = jnp.asarray(rng.normal(size=(B, xd, h)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, vd)).astype(np.float32))
    params = ae.init(jax.random.PRNGKey(0), xh, v)
    path = tmp_path / "cw.weights.bin"
    write_weights_bin(path, flatten_channelwise(params["params"]))
    mod = native(path)
    # per-channel nets discovered: v_encoder/c0.. plus the vertical MLP
    assert "v_encoder/c0/" in mod.nets and "v_encoder/c1/" in mod.nets
    assert "yh_func_v/" in mod.nets
    # channel-0 encoder: [B,1] -> [B,h], ELU between layers only
    p = params["params"]["v_encoder"]
    w0, b0 = np.asarray(p["w_0"][0]), np.asarray(p["b_0"][0])
    w1, b1 = np.asarray(p["w_1"][0]), np.asarray(p["b_1"][0])
    x_in = np.asarray(v[:, 0:1])
    hidden = x_in @ w0 + b0
    hidden = np.where(hidden > 0, hidden, np.expm1(hidden))
    expected = hidden @ w1 + b1
    got = mod.forward("v_encoder/c0/", x_in)
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)


def test_channelwise_export_loads_in_runtime(native, tmp_path, rng):
    """Full-circle for the channel-wise DAE: registry export → native
    runtime loads both submodules with per-channel nets."""
    from py_psnode_tpu.train.variants import get_variant

    v = get_variant("dae_channelwise")
    dims = {"x_dim": 2, "z_dim": 1, "v_dim": 2, "i_dim": 2}
    model = v.make_model(dims, 8)
    B, T = 2, 5
    f32 = np.float32
    t = jnp.asarray(np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1))
    x = jnp.asarray(rng.normal(size=(B, T, 2)).astype(f32))
    z = jnp.asarray(rng.normal(size=(B, T, 1)).astype(f32))
    vv = jnp.asarray(rng.normal(size=(B, T, 2)).astype(f32))
    ii = jnp.asarray(rng.normal(size=(B, T, 2)).astype(f32))
    params = model.init(jax.random.PRNGKey(0), t, x, z, vv, ii)
    v.export_fn(model, params, dims, tmp_path / "saved")
    de_mod = native(tmp_path / "saved" / "de_func.weights.bin")
    ae_mod = native(tmp_path / "saved" / "ae_func.weights.bin")
    assert any(n.startswith("x_encoder/c") for n in de_mod.nets)
    assert "xh_dot_v/" in de_mod.nets
    out = de_mod.forward("x_encoder/c0/", np.zeros((1, 1), np.float32))
    assert out.shape == (1, 8) and np.isfinite(out).all()
    assert "yh_func_v/" in ae_mod.nets


def test_exported_artifact_loads(native, tmp_path, rng):
    """Full-circle: trainer export → native runtime."""
    from py_psnode_tpu.train.variants import get_variant

    v = get_variant("ode_no_encode")
    model = v.make_model({"x_dim": 2, "z_dim": 2}, 8)
    B, T = 2, 5
    t = jnp.asarray(np.cumsum(np.full((B, T, 1), 0.02, np.float32), axis=1))
    x = jnp.asarray(rng.normal(size=(B, T, 2)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(B, T, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), t, x, z)
    v.export_fn(model, params, {"x_dim": 2, "z_dim": 2}, tmp_path / "saved")
    mod = native(tmp_path / "saved" / "de_func.weights.bin")
    out = mod.forward("x_dot/", np.zeros((1, 3 * 4), np.float32))
    assert out.shape == (1, 2)
    assert np.isfinite(out).all()


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_native_ode_encode_rollout_parity(native, tmp_path, rng, solver):
    """The C++ full direct-encode ODE rollout (codecs + latent dynamics)
    == ODEEncodeModel.apply (no events)."""
    from py_psnode_tpu.export.native_runtime import ode_encode_rollout
    from py_psnode_tpu.models import ODEEncodeModel

    B, T, xd, zd, h = 3, 10, 2, 2, 8
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    x = rng.normal(size=(B, T, xd)).astype(f32)
    z = rng.normal(size=(B, T, zd)).astype(f32)
    model = ODEEncodeModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver=solver)
    args = tuple(jnp.asarray(a) for a in (t, x, z))
    params = model.init(jax.random.PRNGKey(0), *args)
    x_ref, _ = model.apply(params, *args)
    x_ref = np.asarray(x_ref)

    p = params["params"]
    mods = {}
    for name in ("de_func", "x_encoder", "x_decoder", "z_encoder"):
        write_weights_bin(
            tmp_path / f"{name}.weights.bin", flatten_params(p[name])
        )
        mods[name] = native(tmp_path / f"{name}.weights.bin")
    got = ode_encode_rollout(
        mods["de_func"], mods["x_encoder"], mods["x_decoder"],
        mods["z_encoder"], t[0, :, 0], x[:, 0], np.swapaxes(z, 0, 1),
        solver=solver,
    )
    np.testing.assert_allclose(
        np.swapaxes(got, 0, 1), x_ref, rtol=3e-4, atol=3e-5
    )


@pytest.mark.parametrize("zd", [1, 0], ids=["z1", "z0"])
@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_native_dae_encode_rollout_parity(native, tmp_path, rng, solver, zd):
    """The C++ full direct-encode DAE rollout (five codecs + raw learned
    init + latent lagged-i + latent algebraic net + x_pred[0] overwrite)
    == DAEEncodeModel.apply (no events), incl. the z_dim == 0 branch."""
    from py_psnode_tpu.export.native_runtime import dae_encode_rollout
    from py_psnode_tpu.models import DAEEncodeModel

    B, T, xd, vd, idim, h = 3, 10, 2, 2, 2, 8
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    x = rng.normal(size=(B, T, xd)).astype(f32)
    z = rng.normal(size=(B, T, zd)).astype(f32)
    v = rng.normal(size=(B, T, vd)).astype(f32)
    i = rng.normal(size=(B, T, idim)).astype(f32)
    model = DAEEncodeModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver=solver
    )
    args = tuple(jnp.asarray(a) for a in (t, x, z, v, i))
    params = model.init(jax.random.PRNGKey(0), *args)
    x_ref, i_ref, _, _ = model.apply(params, *args)
    x_ref, i_ref = np.asarray(x_ref), np.asarray(i_ref)

    p = params["params"]
    names = ["de_func", "ae_func", "init_func", "x_encoder", "x_decoder",
             "v_encoder", "i_encoder", "i_decoder"]
    if zd:
        names.append("z_encoder")
    mods = {}
    for name in names:
        write_weights_bin(
            tmp_path / f"{name}.weights.bin", flatten_params(p[name])
        )
        mods[name] = native(tmp_path / f"{name}.weights.bin")
    x_got, i_got = dae_encode_rollout(
        mods["de_func"], mods["ae_func"], mods["init_func"],
        mods["x_encoder"], mods["x_decoder"], mods.get("z_encoder"),
        mods["v_encoder"], mods["i_encoder"], mods["i_decoder"],
        t[0, :, 0], np.swapaxes(z, 0, 1), np.swapaxes(v, 0, 1), i[:, 0],
        solver=solver,
    )
    np.testing.assert_allclose(
        np.swapaxes(x_got, 0, 1), x_ref, rtol=3e-4, atol=3e-5
    )
    np.testing.assert_allclose(
        np.swapaxes(i_got, 0, 1), i_ref, rtol=3e-4, atol=3e-5
    )


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_native_cw_ode_rollout_parity(native, tmp_path, rng, solver):
    """The C++ channel-wise ODE rollout (per-channel codecs + vertical net)
    == ChannelWiseODEModel.apply (no events)."""
    from py_psnode_tpu.export import flatten_channelwise
    from py_psnode_tpu.export.native_runtime import cw_ode_rollout
    from py_psnode_tpu.models import ChannelWiseODEModel

    B, T, xd, zd, h = 3, 9, 2, 2, 8
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    x = rng.normal(size=(B, T, xd)).astype(f32)
    z = rng.normal(size=(B, T, zd)).astype(f32)
    model = ChannelWiseODEModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver=solver)
    args = tuple(jnp.asarray(a) for a in (t, x, z))
    params = model.init(jax.random.PRNGKey(0), *args)
    x_ref, _ = model.apply(params, *args)
    x_ref = np.asarray(x_ref)

    path = tmp_path / "de_func.weights.bin"
    write_weights_bin(path, flatten_channelwise(params["params"]["de_func"]))
    de = native(path)
    got = cw_ode_rollout(de, t[0, :, 0], x[:, 0], np.swapaxes(z, 0, 1), solver=solver)
    np.testing.assert_allclose(
        np.swapaxes(got, 0, 1), x_ref, rtol=3e-4, atol=3e-5
    )


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_native_cw_dae_rollout_parity(native, tmp_path, rng, solver):
    """The C++ channel-wise DAE rollout (latent ODE + decoupled channel-wise
    algebraic readout) == ChannelWiseDAEModel.apply (no events)."""
    from py_psnode_tpu.export import flatten_channelwise
    from py_psnode_tpu.export.native_runtime import cw_dae_rollout
    from py_psnode_tpu.models import ChannelWiseDAEModel

    B, T, xd, zd, vd, idim, h = 3, 9, 2, 1, 2, 2, 8
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.02, f32), axis=1) - 0.02).astype(f32)
    x = rng.normal(size=(B, T, xd)).astype(f32)
    z = rng.normal(size=(B, T, zd)).astype(f32)
    v = rng.normal(size=(B, T, vd)).astype(f32)
    i = rng.normal(size=(B, T, idim)).astype(f32)
    model = ChannelWiseDAEModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver=solver
    )
    args = tuple(jnp.asarray(a) for a in (t, x, z, v, i))
    params = model.init(jax.random.PRNGKey(0), *args)
    x_ref, i_ref, _ = model.apply(params, *args)
    x_ref, i_ref = np.asarray(x_ref), np.asarray(i_ref)

    p = params["params"]
    for name in ("de_func", "ae_func"):
        write_weights_bin(
            tmp_path / f"{name}.weights.bin", flatten_channelwise(p[name])
        )
    de = native(tmp_path / "de_func.weights.bin")
    ae = native(tmp_path / "ae_func.weights.bin")
    x_got, i_got = cw_dae_rollout(
        de, ae, t[0, :, 0], x[:, 0], np.swapaxes(z, 0, 1),
        np.swapaxes(v, 0, 1), idim, solver=solver,
    )
    np.testing.assert_allclose(
        np.swapaxes(x_got, 0, 1), x_ref, rtol=3e-4, atol=3e-5
    )
    np.testing.assert_allclose(
        np.swapaxes(i_got, 0, 1), i_ref, rtol=3e-4, atol=3e-5
    )


# ---------------------------------------------------------------------------
# Incremental stepper — the PSOPS co-simulation contract: step-by-step
# outputs must be identical to the batch rollouts (same C code paths), and
# host-driven events (post-jump inputs fed per step) must match the JAX
# model's own event handling.
# ---------------------------------------------------------------------------


def _grid(B, T, dt=0.02):
    f32 = np.float32
    return (np.cumsum(np.full((B, T, 1), dt, f32), axis=1) - dt).astype(f32)


def test_stepper_ode_matches_rollout(native, tmp_path, rng):
    from py_psnode_tpu.export.native_runtime import NativeStepper, ode_rollout
    from py_psnode_tpu.models.funcs import DEFunc

    B, T, xd, zd, h = 3, 11, 2, 2, 8
    de_mod = DEFunc((h, h, h, xd))
    feat = jnp.asarray(rng.normal(size=(B, 3 * (xd + zd))).astype(np.float32))
    params = de_mod.init(
        jax.random.PRNGKey(0), 0.0,
        feat[:, : xd + zd], feat[:, :xd], feat[:, xd : xd + zd],
    )
    write_weights_bin(tmp_path / "de.weights.bin",
                      flatten_params(params["params"]))
    de = native(tmp_path / "de.weights.bin")

    t = _grid(B, T)
    x0 = rng.normal(size=(B, xd)).astype(np.float32)
    z = rng.normal(size=(T, B, zd)).astype(np.float32)
    for solver in ("euler", "midpoint", "rk4"):
        ref = ode_rollout(de, t[0, :, 0], x0, z, solver=solver)
        st = NativeStepper("ode", [de], batch=B, x_dim=xd, z_dim=zd,
                           solver=solver)
        got = [st.init(x0=x0, z0=z[0])]
        for j in range(1, T):
            got.append(st.step(t[0, j, 0] - t[0, j - 1, 0], z_prev=z[j - 1]))
        np.testing.assert_array_equal(np.stack(got), ref)


def test_stepper_dae_matches_rollout(native, tmp_path, rng):
    from py_psnode_tpu.export.native_runtime import NativeStepper, dae_rollout
    from py_psnode_tpu.models import DAEModel

    B, T, xd, zd, vd, idim, h = 3, 10, 2, 1, 2, 2, 8
    t = _grid(B, T)
    x = rng.normal(size=(B, T, xd)).astype(np.float32)
    z = rng.normal(size=(B, T, zd)).astype(np.float32)
    v = rng.normal(size=(B, T, vd)).astype(np.float32)
    i = rng.normal(size=(B, T, idim)).astype(np.float32)
    model = DAEModel(x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h,
                     solver="rk4")
    args = tuple(jnp.asarray(a) for a in (t, x, z, v, i))
    params = model.init(jax.random.PRNGKey(0), *args)
    p = params["params"]
    mods = {}
    for name in ("de_func", "ae_func", "init_func"):
        write_weights_bin(tmp_path / f"{name}.weights.bin",
                          flatten_params(p[name]))
        mods[name] = native(tmp_path / f"{name}.weights.bin")

    zt, vt = np.swapaxes(z, 0, 1), np.swapaxes(v, 0, 1)
    x_ref, i_ref = dae_rollout(mods["de_func"], mods["ae_func"],
                               mods["init_func"], t[0, :, 0], zt, vt,
                               i[:, 0], solver="rk4")
    st = NativeStepper(
        "dae", [mods["de_func"], mods["ae_func"], mods["init_func"]],
        batch=B, x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, solver="rk4",
    )
    x0_got, i0_got = st.init(z0=zt[0], v0=vt[0], i0=i[:, 0])
    xs, is_ = [x0_got], [i0_got]
    for j in range(1, T):
        xj, ij = st.step(t[0, j, 0] - t[0, j - 1, 0],
                         z_prev=zt[j - 1], v_prev=vt[j - 1],
                         z_next=zt[j], v_next=vt[j])
        xs.append(xj)
        is_.append(ij)
    np.testing.assert_array_equal(np.stack(xs), x_ref)
    np.testing.assert_array_equal(np.stack(is_), i_ref)


def test_stepper_ode_encode_matches_rollout(native, tmp_path, rng):
    from py_psnode_tpu.export.native_runtime import (
        NativeStepper,
        ode_encode_rollout,
    )
    from py_psnode_tpu.models import ODEEncodeModel

    B, T, xd, zd, h = 3, 9, 2, 2, 8
    t = _grid(B, T)
    x = rng.normal(size=(B, T, xd)).astype(np.float32)
    z = rng.normal(size=(B, T, zd)).astype(np.float32)
    model = ODEEncodeModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver="euler")
    args = tuple(jnp.asarray(a) for a in (t, x, z))
    params = model.init(jax.random.PRNGKey(0), *args)
    p = params["params"]
    mods = {}
    for name in ("de_func", "x_encoder", "x_decoder", "z_encoder"):
        write_weights_bin(tmp_path / f"{name}.weights.bin",
                          flatten_params(p[name]))
        mods[name] = native(tmp_path / f"{name}.weights.bin")
    zt = np.swapaxes(z, 0, 1)
    ref = ode_encode_rollout(mods["de_func"], mods["x_encoder"],
                             mods["x_decoder"], mods["z_encoder"],
                             t[0, :, 0], x[:, 0], zt, solver="euler")
    st = NativeStepper(
        "ode_encode",
        [mods["de_func"], mods["x_encoder"], mods["x_decoder"],
         mods["z_encoder"]],
        batch=B, x_dim=xd, z_dim=zd, solver="euler",
    )
    got = [st.init(x0=x[:, 0], z0=zt[0])]
    for j in range(1, T):
        got.append(st.step(t[0, j, 0] - t[0, j - 1, 0], z_prev=zt[j - 1]))
    np.testing.assert_array_equal(np.stack(got), ref)


@pytest.mark.parametrize("zd", [1, 0], ids=["z1", "z0"])
def test_stepper_dae_encode_matches_rollout(native, tmp_path, rng, zd):
    from py_psnode_tpu.export.native_runtime import (
        NativeStepper,
        dae_encode_rollout,
    )
    from py_psnode_tpu.models import DAEEncodeModel

    B, T, xd, vd, idim, h = 3, 9, 2, 2, 2, 8
    t = _grid(B, T)
    x = rng.normal(size=(B, T, xd)).astype(np.float32)
    z = rng.normal(size=(B, T, zd)).astype(np.float32)
    v = rng.normal(size=(B, T, vd)).astype(np.float32)
    i = rng.normal(size=(B, T, idim)).astype(np.float32)
    model = DAEEncodeModel(x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim,
                           hidden_dim=h, solver="rk4")
    args = tuple(jnp.asarray(a) for a in (t, x, z, v, i))
    params = model.init(jax.random.PRNGKey(0), *args)
    p = params["params"]
    names = ["de_func", "ae_func", "init_func", "x_encoder", "x_decoder",
             "v_encoder", "i_encoder", "i_decoder"]
    if zd:
        names.append("z_encoder")
    mods = {}
    for name in names:
        write_weights_bin(tmp_path / f"{name}.weights.bin",
                          flatten_params(p[name]))
        mods[name] = native(tmp_path / f"{name}.weights.bin")
    zt, vt = np.swapaxes(z, 0, 1), np.swapaxes(v, 0, 1)
    x_ref, i_ref = dae_encode_rollout(
        mods["de_func"], mods["ae_func"], mods["init_func"],
        mods["x_encoder"], mods["x_decoder"], mods.get("z_encoder"),
        mods["v_encoder"], mods["i_encoder"], mods["i_decoder"],
        t[0, :, 0], zt, vt, i[:, 0], solver="rk4",
    )
    st = NativeStepper(
        "dae_encode",
        [mods["de_func"], mods["ae_func"], mods["init_func"],
         mods["x_encoder"], mods["x_decoder"], mods.get("z_encoder"),
         mods["v_encoder"], mods["i_encoder"], mods["i_decoder"]],
        batch=B, x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, solver="rk4",
    )
    x0_got, i0_got = st.init(z0=zt[0] if zd else None, v0=vt[0], i0=i[:, 0])
    xs, is_ = [x0_got], [i0_got]
    for j in range(1, T):
        xj, ij = st.step(
            t[0, j, 0] - t[0, j - 1, 0],
            z_prev=zt[j - 1] if zd else None, v_prev=vt[j - 1],
            z_next=zt[j] if zd else None, v_next=vt[j],
        )
        xs.append(xj)
        is_.append(ij)
    np.testing.assert_array_equal(np.stack(xs), x_ref)
    np.testing.assert_array_equal(np.stack(is_), i_ref)


def test_stepper_cw_families_match_rollouts(native, tmp_path, rng):
    from py_psnode_tpu.export import flatten_channelwise
    from py_psnode_tpu.export.native_runtime import (
        NativeStepper,
        cw_dae_rollout,
        cw_ode_rollout,
    )
    from py_psnode_tpu.models import ChannelWiseDAEModel, ChannelWiseODEModel

    B, T, xd, zd, vd, idim, h = 3, 8, 2, 1, 2, 2, 8
    t = _grid(B, T)
    x = rng.normal(size=(B, T, xd)).astype(np.float32)
    z = rng.normal(size=(B, T, zd)).astype(np.float32)
    v = rng.normal(size=(B, T, vd)).astype(np.float32)
    i = rng.normal(size=(B, T, idim)).astype(np.float32)
    zt, vt = np.swapaxes(z, 0, 1), np.swapaxes(v, 0, 1)

    # channel-wise ODE
    model = ChannelWiseODEModel(x_dim=xd, z_dim=zd, hidden_dim=h,
                                solver="euler")
    params = model.init(jax.random.PRNGKey(0),
                        *(jnp.asarray(a) for a in (t, x, z)))
    write_weights_bin(tmp_path / "cw_de.weights.bin",
                      flatten_channelwise(params["params"]["de_func"]))
    de = native(tmp_path / "cw_de.weights.bin")
    ref = cw_ode_rollout(de, t[0, :, 0], x[:, 0], zt, solver="euler")
    st = NativeStepper("cw_ode", [de], batch=B, x_dim=xd, z_dim=zd,
                       solver="euler")
    got = [st.init(x0=x[:, 0], z0=zt[0])]
    for j in range(1, T):
        got.append(st.step(t[0, j, 0] - t[0, j - 1, 0], z_prev=zt[j - 1]))
    np.testing.assert_array_equal(np.stack(got), ref)

    # channel-wise DAE
    model = ChannelWiseDAEModel(x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim,
                                hidden_dim=h, solver="euler")
    params = model.init(jax.random.PRNGKey(0),
                        *(jnp.asarray(a) for a in (t, x, z, v, i)))
    p = params["params"]
    for name in ("de_func", "ae_func"):
        write_weights_bin(tmp_path / f"cwd_{name}.weights.bin",
                          flatten_channelwise(p[name]))
    de = native(tmp_path / "cwd_de_func.weights.bin")
    ae = native(tmp_path / "cwd_ae_func.weights.bin")
    x_ref, i_ref = cw_dae_rollout(de, ae, t[0, :, 0], x[:, 0], zt, vt, idim,
                                  solver="euler")
    st = NativeStepper("cw_dae", [de, ae], batch=B, x_dim=xd, z_dim=zd,
                       v_dim=vd, i_dim=idim, solver="euler")
    x0_got, i0_got = st.init(x0=x[:, 0], z0=zt[0], v0=vt[0])
    xs, is_ = [x0_got], [i0_got]
    for j in range(1, T):
        xj, ij = st.step(t[0, j, 0] - t[0, j - 1, 0], z_prev=zt[j - 1],
                         v_next=vt[j])
        xs.append(xj)
        is_.append(ij)
    np.testing.assert_array_equal(np.stack(xs), x_ref)
    np.testing.assert_array_equal(np.stack(is_), i_ref)


def test_stepper_host_driven_events_match_jax_model(native, tmp_path, rng):
    """Host-applied events (post-jump z fed per step, the PSOPS embedding
    contract) == ODEModel's own event handling."""
    from py_psnode_tpu.export.native_runtime import NativeStepper
    from py_psnode_tpu.models import ODEModel

    B, T, xd, zd, h = 3, 12, 2, 2, 8
    t = _grid(B, T)
    x = rng.normal(size=(B, T, xd)).astype(np.float32)
    z = rng.normal(size=(B, T, zd)).astype(np.float32)
    jump_idx = 5
    event_t = np.broadcast_to(t[0, jump_idx, :], (B, 1)).astype(np.float32)
    z_jump = rng.normal(size=(B, 1, zd)).astype(np.float32)
    model = ODEModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver="rk4")
    args = tuple(jnp.asarray(a) for a in (t, x, z, event_t, z_jump))
    params = model.init(jax.random.PRNGKey(0), *args)
    ref = np.asarray(model.apply(params, *args))  # [B, T, xd]

    write_weights_bin(tmp_path / "de.weights.bin",
                      flatten_params(params["params"]["de_func"]))
    de = native(tmp_path / "de.weights.bin")
    st = NativeStepper("ode", [de], batch=B, x_dim=xd, z_dim=zd, solver="rk4")
    got = [st.init(x0=x[:, 0], z0=z[:, 0])]
    for j in range(1, T):
        # the host substitutes the post-jump z for the one step STARTING at
        # the event time (ref my_solvers.py:70-72 exact semantics — later
        # steps read the data stream again)
        z_prev = z_jump[:, 0] if (j - 1) == jump_idx else z[:, j - 1]
        got.append(st.step(t[0, j, 0] - t[0, j - 1, 0], z_prev=z_prev))
    np.testing.assert_allclose(
        np.swapaxes(np.stack(got), 0, 1), ref, rtol=2e-4, atol=2e-5
    )


def test_stepper_error_contract(native, tmp_path, rng):
    """Bad variant/solver/handle-count/shape inputs fail loudly instead of
    corrupting state — the host-simulator embedding contract."""
    from py_psnode_tpu.export.native_runtime import NativeStepper
    from py_psnode_tpu.models.funcs import DEFunc

    xd, zd, h, B = 2, 2, 8, 3
    de_mod = DEFunc((h, h, xd))
    feat = jnp.asarray(rng.normal(size=(B, 3 * (xd + zd))).astype(np.float32))
    params = de_mod.init(
        jax.random.PRNGKey(0), 0.0,
        feat[:, : xd + zd], feat[:, :xd], feat[:, xd : xd + zd],
    )
    write_weights_bin(tmp_path / "de_err.weights.bin",
                      flatten_params(params["params"]))
    de = native(tmp_path / "de_err.weights.bin")

    with pytest.raises(RuntimeError, match="stepper_create"):
        NativeStepper("nope", [de], batch=B, x_dim=xd, z_dim=zd)
    with pytest.raises(RuntimeError, match="stepper_create"):
        NativeStepper("ode", [de], batch=B, x_dim=xd, z_dim=zd,
                      solver="cromer")
    with pytest.raises(RuntimeError, match="stepper_create"):
        # DAE needs three modules
        NativeStepper("dae", [de], batch=B, x_dim=xd, z_dim=zd, v_dim=1,
                      i_dim=1)

    st = NativeStepper("ode", [de], batch=B, x_dim=xd, z_dim=zd)
    with pytest.raises(ValueError, match="expected"):
        st.init(x0=np.zeros((B, xd + 1), np.float32),
                z0=np.zeros((B, zd), np.float32))
    with pytest.raises(RuntimeError, match="stepper_init"):
        st.init(x0=None, z0=np.zeros((B, zd), np.float32))  # ODE needs x0
    # step before a successful init → -1
    with pytest.raises(RuntimeError, match="stepper_step"):
        st.step(0.01, z_prev=np.zeros((B, zd), np.float32))
