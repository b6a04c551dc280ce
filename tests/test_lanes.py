"""Lane interleaving (fused_dae.FWD_LANES) only partitions batch rows, so
every lane count computes the same math per row. On the TPU the outputs are
bit-identical (measured maxdiff 0.0 on-chip for lanes 1/2/4 — see
ACCURACY.md); the CPU interpreter's dot kernels pick shape-dependent SIMD
accumulation orders, so here we pin tight-tolerance equivalence and the
fallback/slicing logic. (Backward lanes were measured and REMOVED — they
regress or OOM at every feasible shape; see fused_dae.FWD_LANES notes.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import py_psnode_tpu.ops.fused_dae as FD

from test_fused_dae import _setup
from test_fused_dae_vjp import _fused_loss


@pytest.fixture
def lanes_restore():
    fwd = FD.FWD_LANES
    yield
    FD.FWD_LANES = fwd


def _grads(model, params, batch, dims, targets):
    return jax.value_and_grad(
        lambda p: _fused_loss(model, p, batch, dims, "rk4", targets)
    )(params)


def test_lane_counts_equivalent(rng, lanes_restore):
    # B=4 so lane counts 1/2/4 all divide the batch block
    model, params, batch, args, dims = _setup(
        rng, B=4, T=9, h=8, with_events=True, solver="rk4"
    )
    T, B = batch["t"].shape[1], batch["t"].shape[0]
    xd, zd, vd, idim, h = dims
    targets = (
        jnp.asarray(rng.normal(size=(T, B, xd)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(T, B, idim)).astype(np.float32)),
    )
    outs = {}
    for lanes in (1, 2, 4):
        FD.FWD_LANES = lanes
        outs[lanes] = _grads(model, params, batch, dims, targets)
    l1, g1 = outs[1]
    for lanes in (2, 4):
        l, g = outs[lanes]
        np.testing.assert_allclose(float(l), float(l1), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
            )


def test_non_dividing_lane_count_falls_back(rng, lanes_restore):
    # bB=3 does not divide by 2 -> lane_slices falls back to one lane
    assert FD.lane_slices(3, 2) == [slice(0, 3)]
    assert FD.lane_slices(8, 4) == [
        slice(0, 2), slice(2, 4), slice(4, 6), slice(6, 8)
    ]
