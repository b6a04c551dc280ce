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
