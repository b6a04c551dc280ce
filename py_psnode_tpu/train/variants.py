"""Registry of the four model variants.

One table replaces the reference's four copy-pasted driver scripts: model
construction, batch→argument mapping, loss, the per-variant
``contain_larger_than`` filter constant (ref values 3.29 / None / π / π), and
submodule export recipes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import numpy as np

from py_psnode_tpu.export import (
    export_channelwise_submodule,
    export_submodule,
    write_dim_txt,
)
from py_psnode_tpu.models import (
    AEFunc,
    ChannelWiseDAEModel,
    ChannelWiseODEModel,
    Codec,
    DAEEncodeModel,
    DAEModel,
    DEFunc,
    InitFunc,
    ODEEncodeModel,
    ODEModel,
)
import py_psnode_tpu.train.losses as L

ODE_BATCH_ARGS = ("t", "x", "z", "event_t", "z_jump")
DAE_BATCH_ARGS = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")


@dataclasses.dataclass(frozen=True)
class Variant:
    name: str
    kind: str  # 'ode' | 'dae'
    encode: bool
    larger_than: Optional[float]
    batch_args: Tuple[str, ...]
    make_model: Callable
    loss_fn: Callable
    export_fn: Callable  # (model, params, dims, path) -> None
    # The forward materializes [T, b, h, h] activations (channel-wise AE
    # vertical net applied across the whole solution), so an uncapped
    # whole-test-set eval batch OOMs HBM at the reference envelope. Any
    # variant with that shape must set this, not rely on its name.
    eval_batch_capped: bool = False

    @property
    def loss_keys(self):
        return ("x_loss", "i_loss", "loss") if self.kind == "dae" else ("x_loss", "loss")


def _ode_dims(ds):
    return dict(x_dim=ds.x.shape[-1], z_dim=ds.z.shape[-1])


def _dae_dims(ds):
    return dict(
        x_dim=ds.x.shape[-1],
        z_dim=ds.z.shape[-1],
        v_dim=ds.v.shape[-1],
        i_dim=ds.i.shape[-1],
    )


# --- export recipes (artifact names mirror the reference TorchScript set) ---


def _export_ode_no_encode(model, params, dims, path):
    """ref neural_00_ODE_01_no_encode.py:93-101 — de_func only."""
    h = model.hidden_dim
    xd, zd = dims["x_dim"], dims["z_dim"]
    p = params["params"]
    B = 1
    z32 = lambda *s: np.zeros(s, np.float32)
    export_submodule(
        path, "de_func", DEFunc((h, h, h, xd)), p["de_func"],
        (0.0, z32(B, xd + zd), z32(B, xd), z32(B, zd)),
    )


def _export_ode_encode(model, params, dims, path):
    """ref neural_00_ODE_02_direct_encode.py:91-115 — codecs + de_func + dim.txt."""
    h = model.hidden_dim
    xd, zd = dims["x_dim"], dims["z_dim"]
    p = params["params"]
    z32 = lambda *s: np.zeros(s, np.float32)
    write_dim_txt(path, h)
    export_submodule(path, "x_encoder", Codec((h, h)), p["x_encoder"], (z32(1, xd),))
    export_submodule(path, "x_decoder", Codec((h, xd)), p["x_decoder"], (z32(1, h),))
    export_submodule(path, "z_encoder", Codec((h, h)), p["z_encoder"], (z32(1, zd),))
    export_submodule(
        path, "de_func", DEFunc((h, h)), p["de_func"],
        (0.0, z32(1, 2 * h), z32(1, h), z32(1, h)),
    )


def _export_dae_no_encode(model, params, dims, path):
    """ref neural_01_DAE_01_no_encode.py:117-133 — init/de/ae funcs."""
    h = model.hidden_dim
    xd, zd, vd, idim = dims["x_dim"], dims["z_dim"], dims["v_dim"], dims["i_dim"]
    sd = xd if xd > 0 else (model.latent_x_dim or h)
    p = params["params"]
    z32 = lambda *s: np.zeros(s, np.float32)
    all_init = z32(1, sd + zd + vd + idim)
    export_submodule(
        path, "init_func", InitFunc((h, h, sd)), p["init_func"],
        (z32(1, zd), z32(1, vd), z32(1, idim)),
    )
    export_submodule(
        path, "de_func", DEFunc((h, h, h, sd)), p["de_func"],
        (0.0, all_init, z32(1, sd), z32(1, zd), z32(1, vd), z32(1, idim)),
    )
    export_submodule(
        path, "ae_func", AEFunc((h, h, h, idim)), p["ae_func"],
        (all_init, z32(1, sd), z32(1, zd), z32(1, vd)),
    )


def _export_dae_encode(model, params, dims, path):
    """ref neural_01_DAE_02_direct_encode.py:155-201 — all 9 + dim.txt."""
    h = model.hidden_dim
    xd, zd, vd, idim = dims["x_dim"], dims["z_dim"], dims["v_dim"], dims["i_dim"]
    p = params["params"]
    z32 = lambda *s: np.zeros(s, np.float32)
    write_dim_txt(path, h)
    export_submodule(path, "x_encoder", Codec((h, h)), p["x_encoder"], (z32(1, xd),))
    export_submodule(path, "x_decoder", Codec((h, xd)), p["x_decoder"], (z32(1, h),))
    if zd != 0:
        export_submodule(path, "z_encoder", Codec((h, h)), p["z_encoder"], (z32(1, zd),))
    export_submodule(path, "v_encoder", Codec((h, h)), p["v_encoder"], (z32(1, vd),))
    export_submodule(path, "i_encoder", Codec((h, h)), p["i_encoder"], (z32(1, idim),))
    export_submodule(path, "i_decoder", Codec((h, idim)), p["i_decoder"], (z32(1, h),))
    export_submodule(
        path, "init_func", InitFunc((h, h, xd)), p["init_func"],
        (z32(1, zd), z32(1, vd), z32(1, idim)),
    )
    n_streams = 3 if zd == 0 else 4
    export_submodule(
        path, "de_func", DEFunc((h, h)), p["de_func"],
        (0.0, z32(1, n_streams * h), z32(1, h), z32(1, h if zd else 0), z32(1, h), z32(1, h)),
    )
    export_submodule(
        path, "ae_func", AEFunc((h, h)), p["ae_func"],
        (z32(1, n_streams * h), z32(1, h), z32(1, h if zd else 0), z32(1, h)),
    )


def _export_ode_channelwise(model, params, dims, path):
    """Channel-wise ODE export (the family the reference ships but never
    wires up — neural_base.py:68-133). See
    :func:`py_psnode_tpu.export.flatten_channelwise` for the per-channel
    binfmt decision; stacked ``.npz`` + sliced ``.bin`` + dim.txt."""
    from py_psnode_tpu.models.funcs import ChannelWiseDEFunc

    h = model.hidden_dim
    xd, zd = dims["x_dim"], dims["z_dim"]
    p = params["params"]
    z32 = lambda *s: np.zeros(s, np.float32)
    write_dim_txt(path, h)
    de = ChannelWiseDEFunc(x_dim=xd, z_dim=zd, hidden_dim=h)
    export_channelwise_submodule(
        path, "de_func", p["de_func"],
        stablehlo_fn=lambda pp, *a: de.apply({"params": pp}, *a),
        example_args=(0.0, z32(1, xd + zd, h), z32(1, xd, h), z32(1, zd)),
    )


def _export_dae_channelwise(model, params, dims, path):
    """Channel-wise DAE export — de_func + ae_func, same binfmt decision."""
    from py_psnode_tpu.models.funcs import ChannelWiseAEFunc, ChannelWiseDEFunc

    h = model.hidden_dim
    xd, zd, vd, idim = dims["x_dim"], dims["z_dim"], dims["v_dim"], dims["i_dim"]
    p = params["params"]
    z32 = lambda *s: np.zeros(s, np.float32)
    write_dim_txt(path, h)
    de = ChannelWiseDEFunc(x_dim=xd, z_dim=zd, hidden_dim=h)
    export_channelwise_submodule(
        path, "de_func", p["de_func"],
        stablehlo_fn=lambda pp, *a: de.apply({"params": pp}, *a),
        example_args=(0.0, z32(1, xd + zd, h), z32(1, xd, h), z32(1, zd)),
    )
    ae = ChannelWiseAEFunc(x_dim=xd, v_dim=vd, i_dim=idim, hidden_dim=h)
    export_channelwise_submodule(
        path, "ae_func", p["ae_func"],
        stablehlo_fn=lambda pp, *a: ae.apply({"params": pp}, *a),
        example_args=(z32(1, xd, h), z32(1, vd)),
    )


VARIANTS = {
    "ode_no_encode": Variant(
        name="ode_no_encode",
        kind="ode",
        encode=False,
        larger_than=3.29,
        batch_args=ODE_BATCH_ARGS,
        make_model=lambda dims, hidden, **kw: ODEModel(
            **dims, hidden_dim=hidden, **kw
        ),
        loss_fn=L.ode_no_encode_loss,
        export_fn=_export_ode_no_encode,
    ),
    "ode_encode": Variant(
        name="ode_encode",
        kind="ode",
        encode=True,
        larger_than=None,
        batch_args=ODE_BATCH_ARGS,
        make_model=lambda dims, hidden, **kw: ODEEncodeModel(
            **dims, hidden_dim=hidden, **kw
        ),
        loss_fn=L.ode_encode_loss,
        export_fn=_export_ode_encode,
    ),
    "dae_no_encode": Variant(
        name="dae_no_encode",
        kind="dae",
        encode=False,
        larger_than=math.pi,
        batch_args=DAE_BATCH_ARGS,
        make_model=lambda dims, hidden, **kw: DAEModel(
            **dims, hidden_dim=hidden, **kw
        ),
        loss_fn=L.dae_no_encode_loss,
        export_fn=_export_dae_no_encode,
    ),
    "dae_encode": Variant(
        name="dae_encode",
        kind="dae",
        encode=True,
        larger_than=math.pi,
        batch_args=DAE_BATCH_ARGS,
        make_model=lambda dims, hidden, **kw: DAEEncodeModel(
            **dims, hidden_dim=hidden, **kw
        ),
        loss_fn=L.dae_encode_loss,
        export_fn=_export_dae_encode,
    ),
    # --- channel-wise alternate family (repaired neural_base.py:68-255) ---
    "ode_channelwise": Variant(
        name="ode_channelwise",
        kind="ode",
        encode=True,  # per-channel autoencoding design
        larger_than=None,
        batch_args=ODE_BATCH_ARGS,
        make_model=lambda dims, hidden, **kw: ChannelWiseODEModel(
            **dims, hidden_dim=hidden, **kw
        ),
        loss_fn=L.ode_channelwise_loss,
        export_fn=_export_ode_channelwise,
    ),
    "dae_channelwise": Variant(
        name="dae_channelwise",
        kind="dae",
        encode=True,
        larger_than=None,
        batch_args=DAE_BATCH_ARGS,
        make_model=lambda dims, hidden, **kw: ChannelWiseDAEModel(
            **dims, hidden_dim=hidden, **kw
        ),
        loss_fn=L.dae_channelwise_loss,
        export_fn=_export_dae_channelwise,
        eval_batch_capped=True,
    ),
}


def get_variant(name: str) -> Variant:
    try:
        return VARIANTS[name]
    except KeyError:
        raise ValueError(f"unknown variant {name!r}; choose from {sorted(VARIANTS)}")


def dataset_dims(variant: Variant, ds):
    return _dae_dims(ds) if variant.kind == "dae" else _ode_dims(ds)
