"""Data-parallel sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4.5): sharded training matches single-device bitwise-tolerance,
padding rows are exact no-ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.data import write_avr_dataset
from py_psnode_tpu.parallel import make_mesh, pad_batch
from py_psnode_tpu.train import TrainConfig, Trainer


def test_mesh_shape():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")
    mesh4 = make_mesh(4)
    assert mesh4.devices.shape == (4, 1)


def test_pad_batch_masks_zeroed():
    batch = {
        "x": np.ones((5, 3, 2), np.float32),
        "mask": np.ones((5, 3, 2), np.float32),
    }
    out = pad_batch(batch, 8)
    assert out["x"].shape[0] == 8
    assert (out["mask"][5:] == 0).all()
    assert (out["mask"][:5] == 1).all()


@pytest.fixture(scope="module")
def avr_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("avr_shard")
    return write_avr_dataset(d, n_train=16, n_test=8, n_steps=21, seed=0)


def test_sharded_training_matches_single_device(avr_data, tmp_path):
    train_f, test_f = avr_data

    def run(n_devices, tag):
        cfg = TrainConfig(
            variant="ode_no_encode",
            train_data=str(train_f),
            test_data=str(test_f),
            model=str(tmp_path / tag),
            num=16,
            batch=8,
            hidden=8,
            epoch=1,
            step=21,
            n_devices=n_devices,
            echo_logs=False,
        )
        params, path = Trainer(cfg).train()
        return jax.tree_util.tree_map(np.asarray, params)

    p1 = run(None, "single")
    p8 = run(8, "mesh8")
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_padded_rows_are_noops(avr_data):
    """Loss and grads with a padded batch equal the unpadded computation."""
    from py_psnode_tpu.data import OdeSamples
    from py_psnode_tpu.train.variants import get_variant

    train_f, _ = avr_data
    ds = OdeSamples.load(train_f)
    v = get_variant("ode_no_encode")
    model = v.make_model({"x_dim": 2, "z_dim": 2}, 8)
    batch5 = {k: getattr(ds, k)[:5] for k in v.batch_args + ("mask",)}
    args5 = tuple(jnp.asarray(batch5[k]) for k in v.batch_args)
    params = model.init(jax.random.PRNGKey(0), *args5)

    def loss_of(params, batch):
        out = model.apply(params, *[jnp.asarray(batch[k]) for k in v.batch_args])
        return v.loss_fn(out, batch)[0]

    batch5["sample_w"] = np.ones(5, np.float32)
    l5, g5 = jax.value_and_grad(loss_of)(params, batch5)

    batch8 = pad_batch({k: np.asarray(vv) for k, vv in batch5.items() if k != "sample_w"}, 8)
    batch8["sample_w"] = (np.arange(8) < 5).astype(np.float32)
    l8, g8 = jax.value_and_grad(loss_of)(params, batch8)

    np.testing.assert_allclose(float(l5), float(l8), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g5), jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8)


def test_pod_mesh_single_host():
    from py_psnode_tpu.parallel import initialize, make_pod_mesh

    assert initialize() is False  # single-process no-op
    mesh = make_pod_mesh()
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape[0] == 1
    assert mesh.devices.size == len(jax.devices())
