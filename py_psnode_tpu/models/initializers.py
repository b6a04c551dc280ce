"""Weight-init styles.

Flax ``nn.Dense`` defaults to lecun_normal kernels + zero biases; torch
``nn.Linear`` (every net in the reference, e.g.
``/root/reference/neural_00_ODE_01_no_encode.py:61-64``) draws
``kaiming_uniform(a=sqrt(5))`` kernels and ``U(±1/sqrt(fan_in))`` biases —
both reduce to ``U(±1/sqrt(fan_in))``. The distributions differ in shape
(uniform vs normal, ~0.58x the std) and, more importantly, in the BIAS:
torch starts with nonzero biases, which breaks ELU dead-zone symmetry
differently at the start of training.

:func:`torch_style_init` re-draws an initialized param tree in the torch
distribution — used for accuracy-parity studies against the reference
(``TrainConfig.init_style="torch"``) so convergence comparisons can rule
initialization in or out.
"""

from __future__ import annotations

import jax
import numpy as np


def _uniform(key, shape, dtype, bound):
    return jax.random.uniform(
        key, shape, dtype, minval=-bound, maxval=bound
    )


def torch_style_init(params, key):
    """Re-draw every Dense ``{kernel, bias}`` pair (and every stacked
    per-channel ``{w_i, b_i}`` pair, fan_in = middle axis) as torch's
    ``nn.Linear`` default init. Shapes/dtypes/tree structure unchanged."""

    def walk(node, key):
        if not isinstance(node, dict):
            return node
        out = {}
        items = sorted(node.items())
        for k, v in items:
            if not isinstance(v, dict):
                out[k] = v
        # flax Dense leaf dict: {kernel [in, out], bias [out]}
        if "kernel" in out and "bias" in out and out["kernel"].ndim == 2:
            kk, kb = jax.random.split(key)
            ker = out["kernel"]
            bound = 1.0 / np.sqrt(ker.shape[0])
            out["kernel"] = _uniform(kk, ker.shape, ker.dtype, bound)
            out["bias"] = _uniform(kb, out["bias"].shape, out["bias"].dtype,
                                   bound)
        else:
            # PerChannelMLP stacked pairs: w_i [C, d_in, f] / b_i [C, f]
            for k in list(out):
                if k.startswith("w_") and f"b_{k[2:]}" in out and out[k].ndim == 3:
                    key, kk, kb = jax.random.split(key, 3)
                    w = out[k]
                    bound = 1.0 / np.sqrt(w.shape[1])
                    out[k] = _uniform(kk, w.shape, w.dtype, bound)
                    bkey = f"b_{k[2:]}"
                    out[bkey] = _uniform(kb, out[bkey].shape,
                                         out[bkey].dtype, bound)
        for k, v in items:
            if isinstance(v, dict):
                key, sub = jax.random.split(key)
                out[k] = walk(v, sub)
        return out

    return walk(params, key)
