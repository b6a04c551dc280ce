"""Neural ODE model variants (no-encode and direct-encode).

Batch-major API mirroring the reference drivers: ``forward(t, x, z, event_t,
z_jump)`` with ``t: [B, T, 1]``, ``x: [B, T, xd]``, ``z: [B, T, zd]``,
``event_t: [B, E]``, ``z_jump: [B, E, zd]``.

References: ``/root/reference/neural_00_ODE_01_no_encode.py:58-101`` (no
encode) and ``neural_00_ODE_02_direct_encode.py:49-115`` (direct encode).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from py_psnode_tpu.models.funcs import Codec, DEFunc
from py_psnode_tpu.solvers import event_match, integrate_ode, jumped_stream


def _tm(a):
    """Batch-major ``[B, T, D]`` → time-major ``[T, B, D]``."""
    return jnp.swapaxes(a, 0, 1)


class ODEModel(nn.Module):
    """ODE no-encode: 4-layer skip-augmented dynamics on raw states
    (ref neural_00_ODE_01_no_encode.py:71-101)."""

    x_dim: int
    z_dim: int
    hidden_dim: int
    solver: str = "euler"
    remat: object = True  # False | True | "sqrt" | "adjoint"
    unroll: int = 1

    @nn.compact
    def __call__(
        self,
        t,
        x,
        z,
        event_t: Optional[jnp.ndarray] = None,
        z_jump: Optional[jnp.ndarray] = None,
        input_true_x: bool = False,
    ):
        h = self.hidden_dim
        de = DEFunc((h, h, h, self.x_dim), name="de_func")

        is_event, e_idx = event_match(t, event_t)
        z_used = jumped_stream(z, z_jump, is_event, e_idx)

        tT, xT = _tm(t), _tm(x)
        zT_used = _tm(z_used)
        all_initial = jnp.concatenate([xT[0], _tm(z)[0]], axis=-1)
        de_fn = lambda tt, xx, zz: de(tt, all_initial, xx, zz)
        if self.is_initializing():
            # materialize params outside the scan (flax + lax.scan contract)
            de_fn(tT[0], xT[0], zT_used[0])
        sol = integrate_ode(
            self.solver,
            de_fn,
            tT,
            xT,
            zT_used[:-1],
            input_true_x=input_true_x,
            remat=self.remat,
            unroll=self.unroll,
        )
        return _tm(sol)


class ODEEncodeModel(nn.Module):
    """ODE direct-encode: whole-vector autoencoder, latent-space integration,
    events jump in latent space (ref neural_00_ODE_02_direct_encode.py:60-89).

    Returns ``(x_pred, x_re)``; ``x_re`` feeds the reconstruction loss.
    """

    x_dim: int
    z_dim: int
    hidden_dim: int
    solver: str = "euler"
    remat: object = True  # False | True | "sqrt" | "adjoint"
    unroll: int = 1

    @nn.compact
    def __call__(
        self,
        t,
        x,
        z,
        event_t: Optional[jnp.ndarray] = None,
        z_jump: Optional[jnp.ndarray] = None,
        input_true_x: bool = False,
    ):
        h = self.hidden_dim
        x_encoder = Codec((h, h), name="x_encoder")
        x_decoder = Codec((h, self.x_dim), name="x_decoder")
        z_encoder = Codec((h, h), name="z_encoder")
        de = DEFunc((h, h), name="de_func")

        xh = x_encoder(x)  # [B, T, h]
        zh = z_encoder(z)
        zh_jump = z_encoder(z_jump) if z_jump is not None else None
        is_event, e_idx = event_match(t, event_t)
        zh_used = jumped_stream(zh, zh_jump, is_event, e_idx)

        tT, xhT = _tm(t), _tm(xh)
        zhT_used = _tm(zh_used)
        all_initial = jnp.concatenate([xhT[0], _tm(zh)[0]], axis=-1)
        de_fn = lambda tt, xx, zz: de(tt, all_initial, xx, zz)
        if self.is_initializing():
            de_fn(tT[0], xhT[0], zhT_used[0])
        xh_sol = integrate_ode(
            self.solver,
            de_fn,
            tT,
            xhT,
            zhT_used[:-1],
            input_true_x=input_true_x,
            remat=self.remat,
            unroll=self.unroll,
        )
        x_pred = x_decoder(_tm(xh_sol))
        x_re = x_decoder(xh)
        return x_pred, x_re
