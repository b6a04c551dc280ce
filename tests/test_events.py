"""Event-machinery tests: per-sample schedules, exact-match semantics."""

import jax.numpy as jnp
import numpy as np

from py_psnode_tpu.solvers import event_match, jumped_stream


def test_event_match_per_sample():
    t = jnp.asarray(
        [
            [[0.0], [0.1], [0.2], [0.3]],
            [[0.0], [0.1], [0.2], [0.3]],
        ]
    )
    event_t = jnp.asarray([[0.1, -1.0], [0.3, 0.0]])
    is_event, e_idx = event_match(t, event_t)
    np.testing.assert_array_equal(
        np.array(is_event),
        [[False, True, False, False], [True, False, False, True]],
    )
    assert int(e_idx[0, 1]) == 0
    assert int(e_idx[1, 0]) == 1
    assert int(e_idx[1, 3]) == 0


def test_event_match_none():
    t = jnp.zeros((2, 5, 1))
    is_event, e_idx = event_match(t, None)
    assert not bool(jnp.any(is_event))
    is_event, _ = event_match(t, jnp.zeros((2, 0)))
    assert not bool(jnp.any(is_event))


def test_jumped_stream_substitution():
    t = jnp.asarray([[[0.0], [0.1], [0.2]]])
    z = jnp.asarray([[[1.0, 10.0], [2.0, 20.0], [3.0, 30.0]]])
    event_t = jnp.asarray([[0.1]])
    z_jump = jnp.asarray([[[-5.0, -50.0]]])
    is_event, e_idx = event_match(t, event_t)
    out = jumped_stream(z, z_jump, is_event, e_idx)
    np.testing.assert_allclose(
        np.array(out[0]), [[1.0, 10.0], [-5.0, -50.0], [3.0, 30.0]]
    )


def test_jumped_stream_first_match_wins():
    """Duplicate event times: the first schedule entry is used
    (matches the reference's boolean-mask view semantics)."""
    t = jnp.asarray([[[0.5]]])
    z = jnp.asarray([[[0.0]]])
    event_t = jnp.asarray([[0.5, 0.5]])
    z_jump = jnp.asarray([[[111.0], [222.0]]])
    is_event, e_idx = event_match(t, event_t)
    out = jumped_stream(z, z_jump, is_event, e_idx)
    assert float(out[0, 0, 0]) == 111.0
