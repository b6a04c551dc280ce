"""Adjoint (reverse-pass) integration: ``remat="adjoint"`` must produce the
SAME solution and the SAME gradients as autodiff-through-the-scan BPTT — the
discrete adjoint re-linearizes each saved step, so this is exact-parity
territory, not an approximation bound (solvers/adjoint.py; the reference's
acknowledged TODO at my_solvers.py:69,107)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py_psnode_tpu.models import DAEModel, ODEModel
from py_psnode_tpu.train.losses import dae_no_encode_loss, ode_no_encode_loss


def _ode_batch(B=4, T=17, xd=2, zd=2, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    t = (np.cumsum(np.full((B, T, 1), 0.01), axis=1) - 0.01).astype(dtype)
    batch = {
        "t": t,
        "x": rng.normal(size=(B, T, xd)).astype(dtype),
        "z": rng.normal(size=(B, T, zd)).astype(dtype),
        "event_t": np.full((B, 2), -1.0, dtype),
        "z_jump": rng.normal(size=(B, 2, zd)).astype(dtype),
        "mask": np.ones((B, T, xd), dtype),
    }
    batch["event_t"][:, 0] = t[0, T // 3, 0]  # exercise the event path
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _dae_batch(B=4, T=17, xd=2, zd=1, vd=2, idim=2, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    t = (np.cumsum(np.full((B, T, 1), 0.01), axis=1) - 0.01).astype(dtype)
    batch = {
        "t": t,
        "x": rng.normal(size=(B, T, xd)).astype(dtype),
        "z": rng.normal(size=(B, T, zd)).astype(dtype),
        "v": rng.normal(size=(B, T, vd)).astype(dtype),
        "i": rng.normal(size=(B, T, idim)).astype(dtype),
        "event_t": np.full((B, 2), -1.0, dtype),
        "z_jump": rng.normal(size=(B, 2, zd)).astype(dtype),
        "v_jump": rng.normal(size=(B, 2, vd)).astype(dtype),
        "mask": np.ones((B, T, xd), dtype),
        "sample_w": np.ones((B,), dtype),
    }
    batch["event_t"][:, 0] = t[0, T // 3, 0]
    return {k: jnp.asarray(v) for k, v in batch.items()}


ODE_KEYS = ("t", "x", "z", "event_t", "z_jump")
DAE_KEYS = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_ode_adjoint_matches_bptt(solver):
    batch = _ode_batch()
    args = tuple(batch[k] for k in ODE_KEYS)
    mk = lambda remat: ODEModel(
        x_dim=2, z_dim=2, hidden_dim=16, solver=solver, remat=remat
    )
    params = mk(True).init(jax.random.PRNGKey(0), *args)

    def loss(model):
        def f(p):
            out = model.apply(p, *args)
            l, _ = ode_no_encode_loss(out, batch)
            return l
        return f

    sol_b = mk(True).apply(params, *args)
    sol_a = mk("adjoint").apply(params, *args)
    np.testing.assert_allclose(
        np.asarray(sol_a), np.asarray(sol_b), rtol=1e-6, atol=1e-7
    )

    lb, gb = jax.value_and_grad(loss(mk(True)))(params)
    la, ga = jax.value_and_grad(loss(mk("adjoint")))(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ga),
        jax.tree_util.tree_leaves_with_path(gb),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(ka)}",
        )


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_dae_adjoint_matches_bptt(solver):
    """Events (algebraic recompute), the lagged-i carry, and the learned
    init all participate in the adjoint transpose."""
    batch = _dae_batch()
    args = tuple(batch[k] for k in DAE_KEYS)
    mk = lambda remat: DAEModel(
        x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=16,
        solver=solver, remat=remat,
    )
    params = mk(True).init(jax.random.PRNGKey(0), *args)

    def loss(model):
        def f(p):
            out = model.apply(p, *args)
            l, _ = dae_no_encode_loss(out, batch)
            return l
        return f

    xb, ib = mk(True).apply(params, *args)
    xa, ia = mk("adjoint").apply(params, *args)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ia), np.asarray(ib), rtol=1e-6, atol=1e-7)

    lb, gb = jax.value_and_grad(loss(mk(True)))(params)
    la, ga = jax.value_and_grad(loss(mk("adjoint")))(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ga),
        jax.tree_util.tree_leaves_with_path(gb),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(ka)}",
        )


@pytest.mark.parametrize("variant", ["ode_encode", "dae_encode"])
def test_encode_adjoint_matches_bptt(variant):
    """The encode variants integrate in LATENT space through the same
    integrate_* entry points, so remat='adjoint' covers them for free —
    codecs and recon outputs included in the parity check."""
    from py_psnode_tpu.train.losses import dae_encode_loss, ode_encode_loss
    from py_psnode_tpu.train.variants import get_variant

    v = get_variant(variant)
    if v.kind == "dae":
        batch = _dae_batch()
        keys, loss_fn = DAE_KEYS, dae_encode_loss
    else:
        batch = _ode_batch()
        keys, loss_fn = ODE_KEYS, ode_encode_loss
    args = tuple(batch[k] for k in keys)
    mk = lambda remat: v.make_model(
        {"x_dim": 2, "z_dim": batch["z"].shape[-1], "v_dim": 2, "i_dim": 2}
        if v.kind == "dae" else {"x_dim": 2, "z_dim": 2},
        8, solver="euler", remat=remat,
    )
    params = mk(True).init(jax.random.PRNGKey(0), *args)

    def gradfn(model):
        def f(p):
            out = model.apply(p, *args)
            return loss_fn(out, batch)[0]
        return jax.value_and_grad(f)

    lb, gb = gradfn(mk(True))(params)
    la, ga = gradfn(mk("adjoint"))(params)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-7)


def test_channelwise_rejects_adjoint():
    """The channel-wise family's scan has no adjoint path — an explicit
    error beats silently training without rematerialization."""
    from py_psnode_tpu.train.variants import get_variant

    v = get_variant("ode_channelwise")
    batch = _ode_batch()
    args = tuple(batch[k] for k in ODE_KEYS)
    model = v.make_model({"x_dim": 2, "z_dim": 2}, 8, solver="euler",
                         remat="adjoint")
    with pytest.raises(ValueError, match="unknown remat policy"):
        model.init(jax.random.PRNGKey(0), *args)


def test_adjoint_rejects_teacher_forcing():
    batch = _dae_batch()
    args = tuple(batch[k] for k in DAE_KEYS)
    model = DAEModel(
        x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=8,
        solver="euler", remat="adjoint",
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    with pytest.raises(ValueError, match="plain rollout only"):
        model.apply(params, *args, input_true_x=True)


def test_adjoint_under_jit_and_sqrt_equivalence():
    """jitted end-to-end, and 'sqrt' (the prior long-T policy) agrees too —
    the three memory policies are interchangeable on the same math."""
    batch = _ode_batch(T=33)
    args = tuple(batch[k] for k in ODE_KEYS)
    mk = lambda remat: ODEModel(
        x_dim=2, z_dim=2, hidden_dim=16, solver="rk4", remat=remat
    )
    params = mk(True).init(jax.random.PRNGKey(1), *args)

    def gradfn(model):
        def f(p):
            out = model.apply(p, *args)
            return ode_no_encode_loss(out, batch)[0]
        return jax.jit(jax.grad(f))

    ga = gradfn(mk("adjoint"))(params)
    gs = gradfn(mk("sqrt"))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_adjoint_memory_beats_plain_bptt():
    """The point of the adjoint pass: compile-time temp memory of the grad
    must sit FAR below plain no-remat BPTT (which stores every MLP
    activation of every step, O(T*h)), and in the same class as per-step
    jax.checkpoint. Measured via XLA's memory_analysis on the compiled
    grad — deterministic, no execution needed (on-chip counterpart:
    benchmarks/adjoint_bench.py)."""
    batch = _dae_batch(B=8, T=201)
    args = tuple(batch[k] for k in DAE_KEYS)
    mk = lambda remat: DAEModel(
        x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=128,
        solver="rk4", remat=remat,
    )
    params = mk(True).init(jax.random.PRNGKey(0), *args)

    def temp_bytes(model):
        def f(p):
            out = model.apply(p, *args)
            return dae_no_encode_loss(out, batch)[0]

        comp = jax.jit(jax.grad(f)).lower(params).compile()
        mem = comp.memory_analysis()
        if mem is None:  # backend without memory analysis: nothing to pin
            pytest.skip("memory_analysis unavailable on this backend")
        return mem.temp_size_in_bytes

    plain = temp_bytes(mk(False))
    ckpt = temp_bytes(mk(True))
    adj = temp_bytes(mk("adjoint"))
    # measured on XLA CPU (jax 0.9.0): plain 66.2 MB, ckpt 0.98 MB,
    # adjoint 0.99 MB — assert the CLASS, not the exact bytes
    assert adj < plain / 10, (adj, plain)
    assert adj < ckpt * 3, (adj, ckpt)


def test_adjoint_unroll_equivalence():
    """unroll is forwarded to the adjoint's forward AND reverse scans
    (previously dropped silently); math must be unchanged by it."""
    batch = _dae_batch(T=17)
    args = tuple(batch[k] for k in DAE_KEYS)
    mk = lambda unroll: DAEModel(
        x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=16,
        solver="rk4", remat="adjoint", unroll=unroll,
    )
    params = mk(1).init(jax.random.PRNGKey(0), *args)

    def gradfn(model):
        def f(p):
            out = model.apply(p, *args)
            return dae_no_encode_loss(out, batch)[0]
        return jax.jit(jax.value_and_grad(f))

    l1, g1 = gradfn(mk(1))(params)
    l4, g4 = gradfn(mk(4))(params)
    np.testing.assert_allclose(float(l4), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g4), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)
