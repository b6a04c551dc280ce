"""Multi-host (pod) hooks.

Single-host is the tested path on this machine (one chip + virtual CPU
meshes); these helpers wire the standard JAX multi-host recipe for v5e pods:
``jax.distributed.initialize`` per process, a global mesh over
``jax.devices()`` with the DCN axis outermost, and host-local → global array
assembly for the data loader.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Idempotent ``jax.distributed.initialize`` wrapper; no-op when
    single-process (the common case here)."""
    if num_processes in (None, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_pod_mesh(ici_axis: str = "data", dcn_axis: str = "dcn") -> Mesh:
    """Global mesh with the slow DCN axis outermost: gradients all-reduce
    hierarchically (ICI within a slice, DCN across slices)."""
    devices = np.array(jax.devices())
    n_hosts = jax.process_count()
    per = len(devices) // max(n_hosts, 1)
    arr = devices.reshape(n_hosts, per) if n_hosts > 1 else devices.reshape(1, -1)
    return Mesh(arr, (dcn_axis, ici_axis))


def host_batch_to_global(mesh: Mesh, batch, spec):
    """Assemble per-host batch shards into a global array
    (``jax.make_array_from_process_local_data``)."""
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    return {
        k: jax.make_array_from_process_local_data(sh, v) for k, v in batch.items()
    }
