"""Orbax checkpoint round-trip, auto-resume discovery, StableHLO artifact
consumption, flat-binary format round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.export import (
    flatten_params,
    load_params_npz,
    read_weights_bin,
    save_params_npz,
    unflatten_params,
    write_weights_bin,
)
from py_psnode_tpu.train.checkpoints import OrbaxCheckpointer, latest_checkpoint


def _params(rng):
    return {
        "params": {
            "net": {
                "dense_0": {
                    "kernel": jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32)),
                    "bias": jnp.asarray(np.zeros(4, np.float32)),
                }
            }
        }
    }


def test_npz_roundtrip(tmp_path, rng):
    p = _params(rng)
    save_params_npz(tmp_path / "ck", p)
    q = load_params_npz(tmp_path / "ck")
    np.testing.assert_allclose(
        np.asarray(q["params"]["net"]["dense_0"]["kernel"]),
        np.asarray(p["params"]["net"]["dense_0"]["kernel"]),
    )


def test_flatten_unflatten(rng):
    p = _params(rng)
    flat = flatten_params(p)
    assert "params/net/dense_0/kernel" in flat
    q = unflatten_params(flat)
    np.testing.assert_allclose(
        np.asarray(q["params"]["net"]["dense_0"]["bias"]),
        np.asarray(p["params"]["net"]["dense_0"]["bias"]),
    )


def test_binfmt_roundtrip(tmp_path, rng):
    flat = {"a/k": rng.normal(size=(3, 5)).astype(np.float32),
            "b": rng.normal(size=(7,)).astype(np.float32)}
    write_weights_bin(tmp_path / "w.bin", flat)
    back = read_weights_bin(tmp_path / "w.bin")
    assert set(back) == set(flat)
    np.testing.assert_allclose(back["a/k"], flat["a/k"])


def test_orbax_roundtrip_and_latest(tmp_path, rng):
    p = _params(rng)
    ck = OrbaxCheckpointer(tmp_path, keep=2)
    for epoch in (1, 2, 3, 4):
        ck.save(epoch, p, opt_state={"count": jnp.asarray(epoch)})
    ck.wait()
    found = latest_checkpoint(tmp_path)
    assert found is not None and found[0] == 4
    state = ck.restore(found[1])
    np.testing.assert_allclose(
        np.asarray(state["params"]["params"]["net"]["dense_0"]["kernel"]),
        np.asarray(p["params"]["net"]["dense_0"]["kernel"]),
    )
    assert int(np.asarray(state["opt_state"]["count"])) == 4
    # retention: epochs 1..2 garbage-collected
    assert latest_checkpoint(tmp_path)[0] == 4
    remaining = sorted(
        int(q.name.split(".")[-1]) for q in tmp_path.glob("model_checkpoint.*")
    )
    assert remaining == [3, 4]


def test_stablehlo_artifact_roundtrip(tmp_path, rng):
    """The exported artifact must deserialize and reproduce the forward."""
    from py_psnode_tpu.models.funcs import Codec

    codec = Codec((4, 2))
    x = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
    params = codec.init(jax.random.PRNGKey(0), x)
    from py_psnode_tpu.export import export_stablehlo

    fn = lambda p, a: codec.apply({"params": p}, a)
    ok = export_stablehlo(tmp_path / "codec.stablehlo", fn, (params["params"], x))
    assert ok, "export failed on this backend"
    from jax import export as jax_export

    exp = jax_export.deserialize((tmp_path / "codec.stablehlo").read_bytes())
    got = exp.call(params["params"], x)
    expected = codec.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def _fake_run_dir(tmp_path, rng, evals, save_epochs):
    """A run dir with a trainer-shaped train_and_eval.npz (eval row 0 is the
    pre-training eval) and npz checkpoints for ``save_epochs``."""
    rows = [np.asarray([x, x * 0.5]) for x in evals]
    np.savez(
        str(tmp_path / "train_and_eval.npz"),
        train=np.array([], dtype=object),
        eval=np.array(rows, dtype=object),
    )
    for ep in save_epochs:
        save_params_npz(tmp_path / f"model_checkpoint.{ep}", _params(rng))
    return tmp_path


def test_best_checkpoint_selection(tmp_path, rng):
    from py_psnode_tpu.train.checkpoints import best_checkpoint

    # pre-train 9.0; epochs 1..4: 0.5, 0.2, NaN, 0.4 -> best is epoch 2
    _fake_run_dir(tmp_path, rng, [9.0, 0.5, 0.2, np.nan, 0.4], [1, 2, 3, 4])
    ep, path, x = best_checkpoint(tmp_path)
    assert ep == 2 and path.name == "model_checkpoint.2" and x == 0.2


def test_best_checkpoint_pruned_epoch_falls_back(tmp_path, rng):
    """Only SAVED epochs compete: with the true-best checkpoint pruned
    (orbax retention / manual cleanup) the best remaining epoch wins."""
    from py_psnode_tpu.train.checkpoints import best_checkpoint

    _fake_run_dir(tmp_path, rng, [9.0, 0.5, 0.2, np.nan, 0.4], [1, 4])
    ep, path, x = best_checkpoint(tmp_path)
    assert ep == 4 and x == 0.4


def test_resolve_checkpoint(tmp_path, rng):
    from py_psnode_tpu.train.checkpoints import resolve_checkpoint

    (tmp_path / "run").mkdir()
    run = _fake_run_dir(tmp_path / "run", rng, [9.0, 0.5, 0.2], [1, 2])
    # run dir -> best epoch; explicit checkpoint path passes through
    assert resolve_checkpoint(run).name == "model_checkpoint.2"
    ck = run / "model_checkpoint.1"
    assert resolve_checkpoint(ck) == ck
    # a dir with no history/checkpoints raises the actionable error
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(tmp_path / "empty")
    # all-NaN evals: no finite epoch -> same actionable error
    bad = tmp_path / "allnan"
    bad.mkdir()
    _fake_run_dir(bad, rng, [np.nan, np.nan], [1])
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(bad)
