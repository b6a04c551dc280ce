"""Device-mesh construction and sharding helpers.

The reference is single-process single-device (SURVEY.md §2.6); parallelism
here is first-class instead: a ``data`` mesh axis shards the trajectory batch
over ICI, with an optional size-1 ``model`` axis reserved for future tensor
parallelism (the component models are small MLPs, so DP is the productive
axis — BASELINE.json's "fleet batching" north star). Gradients all-reduce
implicitly inside ``jax.jit`` over sharded inputs; no explicit collectives
are needed (XLA inserts ``psum`` over ICI).

Multi-host pods: see :mod:`py_psnode_tpu.parallel.distributed` — the
``Trainer`` builds the ``(dcn, data)`` pod mesh itself when launched under
``jax.distributed`` (or ``TrainConfig.dcn_size``), with a real 2-process
proof in ``pod_smoke.trainer_self_test``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D ``(data,)`` mesh over the first ``n_devices`` local devices.

    A ``model`` axis of size 1 is appended so shardings written against
    ``(data, model)`` specs work unchanged if TP is ever enabled.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices).reshape(len(devices), 1)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Device-put a host batch with the batch axis sharded over ``data``.

    The batch size must be divisible by the ``data`` axis size (pad upstream
    with masked rows if needed — see :func:`pad_batch`).
    """
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def pad_batch(batch: Dict[str, np.ndarray], multiple: int) -> Dict[str, np.ndarray]:
    """Pad the batch axis to a multiple by repeating the last row with a
    zeroed mask, so sharded shapes stay static and padded rows contribute
    nothing to masked losses."""
    n = next(iter(batch.values())).shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch
    out = {}
    for k, v in batch.items():
        tail = np.repeat(v[-1:], pad, axis=0)
        if k == "mask":
            tail = np.zeros_like(tail)
        out[k] = np.concatenate([v, tail], axis=0)
    return out


def replicate_params(mesh: Mesh, params):
    return jax.device_put(params, replicated(mesh))
