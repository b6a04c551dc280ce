from py_psnode_tpu.models.funcs import (  # noqa: F401
    MLP,
    DEFunc,
    AEFunc,
    InitFunc,
    Codec,
    PerChannelMLP,
    ChannelWiseDEFunc,
    ChannelWiseAEFunc,
)
from py_psnode_tpu.models.ode import ODEModel, ODEEncodeModel  # noqa: F401
from py_psnode_tpu.models.dae import DAEModel, DAEEncodeModel  # noqa: F401
from py_psnode_tpu.models.channelwise import (  # noqa: F401
    ChannelWiseDAEModel,
    ChannelWiseODEModel,
)
