"""Neural function blocks shared by all model variants.

The reference defines per-script ``DE_Func`` / ``AE_Func`` / ``Init_Func``
classes as ``Linear→ELU`` stacks (e.g.
``/root/reference/neural_00_ODE_01_no_encode.py:58-68``,
``neural_01_DAE_01_no_encode.py:50-83``). The signature architectural idea is
the *skip-augmented triple*: every dynamics net consumes
``cat(all_initial, u - all_initial, u)`` where ``all_initial`` is the
(encoded) initial condition. Here those blocks are shared, configurable
modules instead of per-script copies.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    """``Dense→ELU`` stack; no activation after the final layer."""

    features: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}")(x)
            if i < len(self.features) - 1:
                x = nn.elu(x)
        return x


class DEFunc(nn.Module):
    """Differential dynamics ``u_dot = MLP(cat(init, u - init, u))``.

    ``u = cat(x, z)`` for ODEs (ref neural_00_ODE_01_no_encode.py:66-68) or
    ``u = cat(x, z, v, i)`` for DAEs (ref neural_01_DAE_01_no_encode.py:69-71).
    ``features`` pins the depth/width: the no-encode variants use
    ``(h, h, h, x_dim)``; the direct-encode variants use ``(h, h)``
    (ref neural_00_ODE_02_direct_encode.py:52-53).
    """

    features: Tuple[int, ...]

    @nn.compact
    def __call__(self, t0, all_initial, *inputs):
        u = jnp.concatenate(inputs, axis=-1)
        h = jnp.concatenate([all_initial, u - all_initial, u], axis=-1)
        return MLP(self.features, name="x_dot")(h)


class AEFunc(nn.Module):
    """Algebraic map ``i_t = MLP(cat(all_initial, x_t, z_t, v_t))``.

    Note the asymmetric input: the initial condition is concatenated but NOT
    differenced (ref neural_01_DAE_01_no_encode.py:74-83).
    """

    features: Tuple[int, ...]

    @nn.compact
    def __call__(self, all_initial, xt, zt, vt):
        h = jnp.concatenate([all_initial, xt, zt, vt], axis=-1)
        return MLP(self.features, name="i_calculator")(h)


class InitFunc(nn.Module):
    """Learned consistent initialization ``x0 = MLP(cat(z0, v0, i0))``
    (ref neural_01_DAE_01_no_encode.py:50-58). Differential states are never
    read from data at inference — only their dimensionality is used.
    """

    features: Tuple[int, ...]

    @nn.compact
    def __call__(self, z0, v0, i0):
        h = jnp.concatenate([z0, v0, i0], axis=-1)
        return MLP(self.features, name="init_fun")(h)


class Codec(nn.Module):
    """Two-layer ELU encoder/decoder used by the direct-encode variants
    (ref neural_00_ODE_02_direct_encode.py:64-69)."""

    features: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        return MLP(self.features, name="net")(x)


# ---------------------------------------------------------------------------
# Channel-wise alternate family
# ---------------------------------------------------------------------------
#
# The reference ships an alternate, partly-dead channel-wise design
# (neural_base.py:68-115,199-229): per-dimension 1→h encoders held in
# nn.ModuleList with a shared hidden-width dynamics net applied over the
# channel axis via a permute trick. The per-channel module lists map naturally
# onto vmapped parameter stacks on TPU — one batched matmul instead of a
# Python loop of tiny ones. The reference classes are keyword-incompatible
# with its own solver (SURVEY.md §2.3); these are repaired, usable versions of
# the same architecture.


class PerChannelMLP(nn.Module):
    """``n_channels`` independent MLPs applied to ``[..., C, d_in]`` slices.

    Equivalent to the reference's ``nn.ModuleList`` of per-dimension nets
    (neural_base.py:71-90) but evaluated as stacked weights.

    ``impl`` picks the evaluation form (identical math either way — the
    off-block weights are exact zeros):

      * ``"einsum"``: one grouped einsum per layer — minimal FLOPs, but the
        TPU runs the C groups as a serial batched matmul (latency-bound at
        small batch).
      * ``"blockdiag"``: channels flattened into ONE wide ``[.., C·d] @
        [C·d, C·f]`` block-diagonal matmul per layer — C× the FLOPs but a
        single full-width MXU op. It helps the latency-bound FORWARD at
        small batch, but over the full train step its gradient pays the
        C×-FLOPs matmuls and einsum wins (suite 10a-10d, ACCURACY.md
        round-4). Only applied to h-wide layers (d_in ≥ 8); 1-wide codec
        layers keep the einsum.
    """

    n_channels: int
    features: Tuple[int, ...]
    d_in: int
    final_activation: Optional[str] = None  # None | 'tanh'
    impl: str = "einsum"

    @nn.compact
    def __call__(self, x):
        # x: [..., C, d_in]
        C = self.n_channels
        d_prev = self.d_in
        for li, f in enumerate(self.features):
            w = self.param(
                f"w_{li}",
                nn.initializers.lecun_normal(),
                (C, d_prev, f),
            )
            b = self.param(f"b_{li}", nn.initializers.zeros, (C, f))
            if self.impl == "blockdiag" and d_prev >= 8 and C > 1:
                # [C, d, f] -> [C·d, C·f] with w[c] at block (c, c); the
                # construction is parameter-only, so XLA's loop-invariant
                # code motion hoists it out of the solver scan
                eye = jnp.eye(C, dtype=w.dtype)
                wbd = (eye[:, None, :, None] * w[:, :, None, :]).reshape(
                    C * d_prev, C * f
                )
                xf = x.reshape(x.shape[:-2] + (C * d_prev,))
                y = xf @ wbd + b.reshape(C * f)
                x = y.reshape(y.shape[:-1] + (C, f))
            else:
                x = jnp.einsum("...ci,cio->...co", x, w) + b
            if li < len(self.features) - 1:
                x = nn.elu(x)
            d_prev = f
        if self.final_activation == "tanh":
            x = jnp.tanh(x)
        return x


class ChannelWiseDEFunc(nn.Module):
    """Channel-wise dynamics (repaired neural_base.py:68-115 family).

    Per-channel 1→h encoders for x and z, per-channel h→h extractors, a shared
    vertical net over the channel axis, and per-channel h→h output heads. The
    dynamics signature matches the solver convention
    ``(t0, all_initial_ext, x_ext, z_ext) -> Xh_dot``.
    """

    x_dim: int
    z_dim: int
    hidden_dim: int
    impl: str = "einsum"  # per-channel matmul form (see PerChannelMLP.impl)

    def setup(self):
        h = self.hidden_dim
        im = self.impl
        self.x_encoder = PerChannelMLP(self.x_dim, (h, h), 1, name="x_encoder")
        self.x_decoder = PerChannelMLP(self.x_dim, (h, 1), h, name="x_decoder")
        self.xh_ext = PerChannelMLP(self.x_dim, (h, h), h, impl=im, name="xh_ext")
        self.xh_dot_head = PerChannelMLP(self.x_dim, (h, h), h, impl=im, name="xh_dot_head")
        self.z_encoder = PerChannelMLP(self.z_dim, (h, h), 1, name="z_encoder")
        self.zh_ext = PerChannelMLP(self.z_dim, (h, h), h, impl=im, name="zh_ext")
        # vertical net over the channel axis (ref neural_base.py:91-94)
        self.xh_dot_v = MLP((h, h, h, self.x_dim), name="xh_dot_v")

    def encode_x(self, x):
        """``[B, xd] -> [B, xd, h]`` per-channel encoding."""
        return self.x_encoder(x[..., None])

    def decode_x(self, xh):
        """``[B, xd, h] -> [B, xd]``."""
        return self.x_decoder(xh)[..., 0]

    def z_features(self, z):
        """``[.., zd] -> [.., zd, h]`` input-channel features. Depends only
        on the KNOWN ``z`` stream, so callers precompute it for ALL steps as
        one batched einsum and keep it out of the solver loop (the scan-
        invariant lifting the fused kernels use — ref my_solvers.py only
        ever feeds recorded ``z``)."""
        return self.zh_ext(self.z_encoder(z[..., None]))

    def features_of(self, xh, z):
        """Extract the stacked channel features ``[B, xd+zd, h]``."""
        fx = self.xh_ext(xh)
        return jnp.concatenate([fx, self.z_features(z)], axis=-2)

    def dyn(self, f_init, xh, fz):
        """Dynamics at precomputed z-features ``fz = z_features(z)`` — the
        per-step hot path: only the ``xh``-dependent extractor runs in the
        loop."""
        fx = self.xh_ext(xh)
        ft = jnp.concatenate([fx, fz], axis=-2)
        feat = jnp.concatenate([ft, f_init, ft - f_init], axis=-2)
        # vertical mix over the channel axis: [B, 3*(xd+zd), h] -> [B, xd, h]
        dot = self.xh_dot_v(jnp.swapaxes(feat, -1, -2))
        dot = jnp.swapaxes(dot, -1, -2)
        return self.xh_dot_head(dot)

    def __call__(self, t0, f_init, xh, z):
        return self.dyn(f_init, xh, self.z_features(z))


class ChannelWiseAEFunc(nn.Module):
    """Channel-wise algebraic net (repaired neural_base.py:199-229 family)."""

    x_dim: int
    v_dim: int
    i_dim: int
    hidden_dim: int
    impl: str = "einsum"  # per-channel matmul form (see PerChannelMLP.impl)

    def setup(self):
        h = self.hidden_dim
        im = self.impl
        self.xh_ext = PerChannelMLP(self.x_dim, (h, h), h, impl=im, name="xh_ext")
        self.v_encoder = PerChannelMLP(self.v_dim, (h, h), 1, name="v_encoder")
        self.vh_ext = PerChannelMLP(self.v_dim, (h, h), h, impl=im, name="vh_ext")
        self.yh_func_v = MLP((h, h, h, self.i_dim), name="yh_func_v")
        self.yh_ext = PerChannelMLP(self.i_dim, (h, h), h, impl=im, name="yh_ext")
        self.y_decoder = PerChannelMLP(self.i_dim, (h, 1), h, name="y_decoder")

    def __call__(self, xh, v):
        fx = self.xh_ext(xh)
        fv = self.vh_ext(self.v_encoder(v[..., None]))
        feat = jnp.concatenate([fx, fv], axis=-2)
        yh = self.yh_func_v(jnp.swapaxes(feat, -1, -2))
        yh = jnp.swapaxes(yh, -1, -2)
        return self.y_decoder(self.yh_ext(yh))[..., 0]
