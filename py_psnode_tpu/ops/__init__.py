from py_psnode_tpu.ops.fused_dae import (  # noqa: F401
    fused_dae_rollout,
    precompute_streams,
    split_de_layer1,
)
