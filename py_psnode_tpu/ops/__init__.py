from py_psnode_tpu.ops.fused_dae import (  # noqa: F401
    fused_dae_rollout,
    precompute_streams,
    split_de_layer1,
)
from py_psnode_tpu.ops.fused_dae_vjp import fused_dae_rollout_diff  # noqa: F401
from py_psnode_tpu.ops.fused_model import fused_dae_apply  # noqa: F401
from py_psnode_tpu.ops.fused_ode import (  # noqa: F401
    fused_ode_apply,
    fused_ode_rollout_diff,
    precompute_ode_streams,
)
from py_psnode_tpu.ops.fused_model import fused_dae_encode_apply  # noqa: F401
from py_psnode_tpu.ops.fused_ode import fused_ode_encode_apply  # noqa: F401
