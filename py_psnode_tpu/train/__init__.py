from py_psnode_tpu.train import losses  # noqa: F401
from py_psnode_tpu.train.optim import (  # noqa: F401
    make_optimizer,
    per_param_clip,
    reference_grad_norm,
    steplr_schedule,
)
from py_psnode_tpu.train.trainer import TrainConfig, Trainer  # noqa: F401
from py_psnode_tpu.train.variants import VARIANTS, get_variant  # noqa: F401
