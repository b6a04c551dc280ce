from py_psnode_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    pad_batch,
    replicate_params,
    replicated,
    shard_batch,
)
from py_psnode_tpu.parallel.distributed import (  # noqa: F401
    host_batch_to_global,
    initialize,
    make_pod_mesh,
)
