"""Teacher-forcing surface tests: the TPU-native TF paths (time-parallel
ODE, fused-ODE-kernel DAE TF-i) must match the golden-tested scan TF
exactly; the trainer/CLI expose the flags end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_fused_dae import _setup
from py_psnode_tpu.train import TrainConfig, Trainer


def _ode_setup(rng, B=3, T=9, xd=2, zd=2, h=8, solver="euler"):
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
    model = ODEModel(x_dim=xd, z_dim=zd, hidden_dim=h, solver=solver)
    args = tuple(batch[k] for k in ("t", "x", "z", "event_t", "z_jump"))
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args


@pytest.mark.parametrize("solver", ["euler", "midpoint", "rk4"])
def test_tf_parallel_ode_matches_scan(rng, solver):
    """The time-parallel TF-x forward == the scan integrator with
    input_true_x=True (values AND grads), events included."""
    from py_psnode_tpu.ops.teacher_forcing import tf_parallel_ode_apply

    model, params, batch, args = _ode_setup(rng, solver=solver)
    ref = model.apply(params, *args, input_true_x=True)
    par = tf_parallel_ode_apply(params, batch, 2, 8, solver=solver)
    np.testing.assert_allclose(np.asarray(par), np.asarray(ref), rtol=1e-5, atol=1e-6)

    tgt = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    g_ref = jax.grad(
        lambda p: jnp.sum((model.apply(p, *args, input_true_x=True) - tgt) ** 2)
    )(params)
    g_par = jax.grad(
        lambda p: jnp.sum((tf_parallel_ode_apply(p, batch, 2, 8, solver=solver) - tgt) ** 2)
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_par), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_fused_dae_tf_i_matches_scan(rng, solver):
    """The fused-kernel TF-i DAE forward == the scan integrator with
    input_true_i=True (values AND grads), events included."""
    from py_psnode_tpu.ops.teacher_forcing import fused_dae_tf_i_apply

    model, params, batch, args, dims5 = _setup(rng, B=3, T=8, h=8, solver=solver)
    dims, h = dims5[:4], dims5[4]
    x_ref, i_ref = model.apply(params, *args, input_true_i=True)
    x_f, i_f = fused_dae_tf_i_apply(
        params, batch, dims, h, solver=solver, interpret=True
    )
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_f), np.asarray(i_ref), rtol=2e-4, atol=1e-5)

    xt = jnp.asarray(rng.normal(size=x_ref.shape).astype(np.float32))
    it = jnp.asarray(rng.normal(size=i_ref.shape).astype(np.float32))

    def loss_ref(p):
        xs, is_ = model.apply(p, *args, input_true_i=True)
        return jnp.sum((xs - xt) ** 2) + 0.5 * jnp.sum((is_ - it) ** 2)

    def loss_f(p):
        xs, is_ = fused_dae_tf_i_apply(p, batch, dims, h, solver=solver, interpret=True)
        return jnp.sum((xs - xt) ** 2) + 0.5 * jnp.sum((is_ - it) ** 2)

    l_r, g_r = jax.value_and_grad(loss_ref)(params)
    l_f, g_f = jax.value_and_grad(loss_f)(params)
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


@pytest.fixture(scope="module")
def smib_data(tmp_path_factory):
    from py_psnode_tpu.data import write_smib_dataset

    d = tmp_path_factory.mktemp("tf_smib")
    return write_smib_dataset(d, n_train=16, n_test=8, n_steps=21, seed=0)


@pytest.fixture(scope="module")
def avr_data(tmp_path_factory):
    from py_psnode_tpu.data import write_avr_dataset

    d = tmp_path_factory.mktemp("tf_avr")
    return write_avr_dataset(d, n_train=16, n_test=8, n_steps=21, seed=0)


@pytest.mark.parametrize(
    "fused,tf_kw",
    [
        (False, dict(input_true_x=True, input_true_i=True)),
        (True, dict(input_true_i=True)),  # fused TF-i kernel path
        (True, dict(input_true_x=True)),  # fused TF-x kernel pair
        (True, dict(input_true_x=True, input_true_i=True)),  # time-parallel
    ],
    ids=["xla_tf_both", "fused_tf_i", "fused_tf_x", "fused_tf_both"],
)
def test_trainer_tf_smoke(smib_data, tmp_path, fused, tf_kw):
    train_f, test_f = smib_data
    cfg = TrainConfig(
        variant="dae_no_encode", train_data=str(train_f),
        test_data=str(test_f), model=str(tmp_path / f"m{fused}"),
        num=12, batch=6, hidden=8, epoch=1, step=21, echo_logs=False,
        larger_than=None, fused=fused, **tf_kw,
    )
    params, model_path = Trainer(cfg).train()
    import numpy as np

    hist = np.load(model_path / "train_and_eval.npz", allow_pickle=True)
    evals = [float(e[0]) + float(e[1]) for e in hist["eval"]]
    assert np.isfinite(evals).all()
    assert evals[-1] < evals[0], f"TF eval loss did not decrease: {evals}"


@pytest.mark.parametrize("solver", ["euler", "rk4"])
@pytest.mark.parametrize("with_events", [False, True], ids=["noev", "ev"])
def test_fused_dae_tf_x_matches_scan(rng, solver, with_events):
    """The fused TF-x DAE kernel pair == the scan integrator with
    input_true_x=True (values AND grads): the step reads TRUE x[j-1], the
    algebraic eval TRUE x[j], the event recompute the ROLLED carry."""
    from py_psnode_tpu.ops.teacher_forcing import fused_dae_tf_x_apply

    model, params, batch, args, dims5 = _setup(
        rng, B=3, T=8, h=8, solver=solver, with_events=with_events
    )
    dims, h = dims5[:4], dims5[4]
    x_ref, i_ref = model.apply(params, *args, input_true_x=True)
    x_f, i_f = fused_dae_tf_x_apply(
        params, batch, dims, h, solver=solver, interpret=True
    )
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_f), np.asarray(i_ref), rtol=2e-4, atol=1e-5)

    xt = jnp.asarray(rng.normal(size=x_ref.shape).astype(np.float32))
    it = jnp.asarray(rng.normal(size=i_ref.shape).astype(np.float32))

    def loss_ref(p):
        xs, is_ = model.apply(p, *args, input_true_x=True)
        return jnp.sum((xs - xt) ** 2) + 0.5 * jnp.sum((is_ - it) ** 2)

    def loss_f(p):
        xs, is_ = fused_dae_tf_x_apply(p, batch, dims, h, solver=solver, interpret=True)
        return jnp.sum((xs - xt) ** 2) + 0.5 * jnp.sum((is_ - it) ** 2)

    l_r, g_r = jax.value_and_grad(loss_ref)(params)
    l_f, g_f = jax.value_and_grad(loss_f)(params)
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("solver", ["euler", "midpoint", "rk4"])
def test_tf_parallel_dae_matches_scan(rng, solver):
    """Full TF (x AND i) DAE == the scan integrator with both flags —
    evaluated time-parallel (no sequential dependence remains)."""
    from py_psnode_tpu.ops.teacher_forcing import tf_parallel_dae_apply

    model, params, batch, args, dims5 = _setup(rng, B=3, T=8, h=8, solver=solver)
    dims, h = dims5[:4], dims5[4]
    x_ref, i_ref = model.apply(params, *args, input_true_x=True, input_true_i=True)
    x_f, i_f = tf_parallel_dae_apply(params, batch, dims, h, solver=solver)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(i_f), np.asarray(i_ref), rtol=1e-5, atol=1e-6)

    xt = jnp.asarray(rng.normal(size=x_ref.shape).astype(np.float32))

    g_ref = jax.grad(
        lambda p: jnp.sum(
            (model.apply(p, *args, input_true_x=True, input_true_i=True)[0] - xt) ** 2
        )
    )(params)
    g_par = jax.grad(
        lambda p: jnp.sum(
            (tf_parallel_dae_apply(p, batch, dims, h, solver=solver)[0] - xt) ** 2
        )
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_par), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_tf_parallel_ode_encode_matches_scan(rng, solver):
    """Time-parallel latent TF-x for the ODE direct-encode variant == the
    scan integrator with input_true_x=True (values AND grads)."""
    from test_fused_encode import _ode_setup as _enc_ode_setup
    from py_psnode_tpu.ops.teacher_forcing import tf_parallel_ode_encode_apply

    model, params, batch, args, h = _enc_ode_setup(rng, solver=solver)
    ref_pred, ref_re = model.apply(params, *args, input_true_x=True)
    got_pred, got_re = tf_parallel_ode_encode_apply(params, batch, h, solver=solver)
    np.testing.assert_allclose(np.asarray(got_pred), np.asarray(ref_pred), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(ref_re), rtol=1e-5, atol=1e-6)

    tgt = jnp.asarray(rng.normal(size=ref_pred.shape).astype(np.float32))

    def loss(fwd):
        def fn(p):
            pred, re = fwd(p)
            return jnp.sum((pred - tgt) ** 2) + jnp.sum(re**2)
        return fn

    g_ref = jax.grad(loss(lambda p: model.apply(p, *args, input_true_x=True)))(params)
    g_par = jax.grad(
        loss(lambda p: tf_parallel_ode_encode_apply(p, batch, h, solver=solver))
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_par), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "tf_kw,fn_name",
    [
        (dict(input_true_x=True), "fused_dae_encode_tf_x_apply"),
        (dict(input_true_i=True), "fused_dae_encode_tf_i_apply"),
        (dict(input_true_x=True, input_true_i=True), "tf_parallel_dae_encode_apply"),
    ],
    ids=["tf_x", "tf_i", "tf_both"],
)
@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_dae_encode_tf_matches_scan(rng, solver, tf_kw, fn_name):
    """The latent-space DAE-encode TF paths (fused kernel pair / fused ODE
    kernel / time-parallel) == the scan integrator with the matching flags
    (values AND grads), events included."""
    from test_fused_encode import _dae_setup as _enc_dae_setup
    from py_psnode_tpu.ops import teacher_forcing as TF

    fn = getattr(TF, fn_name)
    kw = {} if fn_name.startswith("tf_parallel") else dict(interpret=True)
    model, params, batch, args, dims, h = _enc_dae_setup(rng, solver=solver)
    ref = model.apply(params, *args, **tf_kw)
    got = fn(params, batch, dims, h, solver=solver, **kw)
    tol = dict(rtol=3e-4, atol=2e-5)
    for r, g, name in zip(ref, got, ("x_pred", "i_pred", "x_re", "i_re")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), err_msg=name, **tol)

    xt = jnp.asarray(rng.normal(size=ref[0].shape).astype(np.float32))
    it = jnp.asarray(rng.normal(size=ref[1].shape).astype(np.float32))

    def combined(out):
        x_pred, i_pred, x_re, i_re = out
        return (
            jnp.sum((x_pred - xt) ** 2) + jnp.sum((i_pred - it) ** 2)
            + jnp.sum(x_re**2) + 0.3 * jnp.sum(i_re**2)
        )

    l_r, g_r = jax.value_and_grad(
        lambda p: combined(model.apply(p, *args, **tf_kw))
    )(params)
    l_f, g_f = jax.value_and_grad(
        lambda p: combined(fn(p, batch, dims, h, solver=solver, **kw))
    )(params)
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-4)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_r), jax.tree_util.tree_leaves(g_f)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-3, atol=3e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.parametrize(
    "variant,tf_kw",
    [
        ("ode_encode", dict(input_true_x=True)),
        ("dae_encode", dict(input_true_x=True)),
        ("dae_encode", dict(input_true_i=True)),
        ("dae_encode", dict(input_true_x=True, input_true_i=True)),
    ],
    ids=["ode_enc_tf_x", "dae_enc_tf_x", "dae_enc_tf_i", "dae_enc_tf_both"],
)
def test_trainer_fused_tf_encode_smoke(smib_data, avr_data, tmp_path, variant, tf_kw):
    """fused + teacher forcing on the ENCODE variants trains end-to-end
    through the TPU-native TF paths (no XLA fallback remains)."""
    train_f, test_f = smib_data if variant.startswith("dae") else avr_data
    cfg = TrainConfig(
        variant=variant, train_data=str(train_f),
        test_data=str(test_f), model=str(tmp_path / "m"),
        num=12, batch=6, hidden=8, epoch=1, step=21, echo_logs=False,
        larger_than=None, fused=True, **tf_kw,
    )
    params, model_path = Trainer(cfg).train()
    hist = np.load(model_path / "train_and_eval.npz", allow_pickle=True)
    evals = [float(e[0]) for e in hist["eval"]]
    assert np.isfinite(evals).all()


def test_tf_validation_errors(smib_data, tmp_path):
    train_f, test_f = smib_data
    base = dict(
        train_data=str(train_f), test_data=str(test_f),
        model=str(tmp_path / "m"), num=12, batch=6, hidden=8, epoch=1,
        step=21, echo_logs=False, larger_than=None,
    )
    with pytest.raises(ValueError, match="DAE variants only"):
        Trainer(TrainConfig(variant="ode_no_encode", input_true_i=True, **base)).train()
    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(TrainConfig(
            variant="dae_no_encode", input_true_x=True, n_windows=4, **base
        )).train()
    with pytest.raises(ValueError, match="channel-wise"):
        Trainer(TrainConfig(
            variant="dae_channelwise", input_true_x=True, **base
        )).train()


def test_cli_tf_flags():
    from py_psnode_tpu.cli.common import build_parser

    args = build_parser().parse_args(["--input_true_x", "--input_true_i"])
    assert args.input_true_x and args.input_true_i
    args2 = build_parser().parse_args([])
    assert not args2.input_true_x and not args2.input_true_i
