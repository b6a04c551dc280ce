from py_psnode_tpu.export.artifacts import (  # noqa: F401
    export_channelwise_submodule,
    export_stablehlo,
    export_submodule,
    flatten_channelwise,
    flatten_params,
    load_params_npz,
    save_params_npz,
    unflatten_params,
    write_dim_txt,
)
from py_psnode_tpu.export.binfmt import read_weights_bin, write_weights_bin  # noqa: F401
