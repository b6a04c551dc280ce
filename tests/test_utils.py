"""Tests for the utility layer: interp helpers, time-grid builder, Logger,
ReplayBuffer, profiling metrics."""

import json

import jax.numpy as jnp
import numpy as np

from py_psnode_tpu.solvers import (
    cubic_hermite_interp,
    linear_interp,
    time_grid_from_step_size,
)
from py_psnode_tpu.utils import Logger, ReplayBuffer
from py_psnode_tpu.utils.profiling import JsonlMetrics, StepTimer


def test_linear_interp_endpoints_and_mid():
    out = linear_interp(0.0, 1.0, jnp.asarray(2.0), jnp.asarray(4.0), 0.5)
    assert float(out) == 3.0
    assert float(linear_interp(0.0, 1.0, jnp.asarray(2.0), jnp.asarray(4.0), 0.0)) == 2.0
    assert float(linear_interp(0.0, 1.0, jnp.asarray(2.0), jnp.asarray(4.0), 1.0)) == 4.0


def test_cubic_hermite_reproduces_cubic():
    # interpolating x(t) = t^3 with exact values/derivatives is exact
    f = lambda t: t**3
    df = lambda t: 3 * t**2
    t0, t1 = 0.5, 1.5
    for t in (0.7, 1.0, 1.3):
        out = cubic_hermite_interp(
            t0, jnp.asarray(f(t0)), jnp.asarray(df(t0)),
            t1, jnp.asarray(f(t1)), jnp.asarray(df(t1)), t,
        )
        np.testing.assert_allclose(float(out), f(t), rtol=1e-6)


def test_time_grid_from_step_size():
    t = jnp.asarray([0.0, 0.3, 0.95])
    grid = time_grid_from_step_size(t, 0.25)
    assert float(grid[0]) == 0.0
    assert float(grid[-1]) == 0.95  # endpoint forced onto the grid
    np.testing.assert_allclose(np.diff(np.array(grid))[:-1], 0.25, rtol=1e-6)


def test_logger_writes_both_files(tmp_path):
    with Logger(tmp_path, "train.log", "test.log", echo=False) as log:
        log.training_log("hello", 1)
        log.testing_log("world")
    assert (tmp_path / "train.log").read_text() == "hello 1\n"
    assert (tmp_path / "test.log").read_text() == "world\n"


def test_replay_buffer_cycles_and_sampling():
    rb = ReplayBuffer(state_dim=2, action_dim=1, max_size=8, seed=0)
    for k in range(10):  # wraps around
        rb.add(np.full(2, k), [k], np.full(2, k + 1), float(k % 3 == 0), k == 9)
    assert rb.size == 8 and rb.ptr == 2
    s, a, ns, r, nd = rb.sample(4)
    assert s.shape == (4, 2) and a.shape == (4, 1)
    s, a, ns, r, nd = rb.importance_sampling(4)
    # first row is the argmax-reward transition (ref utils.py:95)
    assert r[0, 0] == rb.reward[: rb.size].max()


def test_jsonl_metrics(tmp_path):
    path = tmp_path / "m.jsonl"
    with JsonlMetrics(path) as m:
        m.log(kind="train", loss=1.5)
        m.log(kind="eval", loss=0.5)
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[1]["kind"] == "eval"
    assert "ts" in lines[0]


def test_step_timer():
    t = StepTimer()
    t.start()
    dt = t.stop(jnp.asarray(1.0), n_steps=2)
    assert dt >= 0 and t.best == dt
