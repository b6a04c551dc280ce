"""End-to-end models for the channel-wise alternate family.

The reference ships this family half-dead: ``neural_base.DE_Func`` is
keyword-incompatible with its own solver and ``DAE_Base.forward`` passes a
nonexistent kwarg (SURVEY.md §2.3, "bugs not to reproduce"). These are the
repaired, runnable equivalents — per-channel encoders/heads as stacked
vmapped weights, integrated in the per-channel latent space ``[B, C, h]``.

``ChannelWiseODEModel`` mirrors ``ODE_Base`` + channel-wise ``DE_Func``
(neural_base.py:68-133): encode ``x`` per channel, integrate the latent
``Xh`` with the shared vertical dynamics over the channel axis, decode.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from py_psnode_tpu.models.funcs import ChannelWiseDEFunc
from py_psnode_tpu.solvers import event_match, get_stepper, jumped_stream
from py_psnode_tpu.solvers.integrate import _scan


def _tm(a):
    return jnp.swapaxes(a, 0, 1)


class ChannelWiseODEModel(nn.Module):
    """Channel-wise neural ODE: latent per-channel states ``[B, xd, h]``.

    Returns the decoded solution ``[B, T, xd]`` plus the reconstruction
    ``x_re`` for an autoencoder loss.
    """

    x_dim: int
    z_dim: int
    hidden_dim: int
    solver: str = "euler"
    remat: object = True
    unroll: int = 1

    @nn.compact
    def __call__(
        self,
        t,
        x,
        z,
        event_t: Optional[jnp.ndarray] = None,
        z_jump: Optional[jnp.ndarray] = None,
    ):
        de = ChannelWiseDEFunc(
            x_dim=self.x_dim, z_dim=self.z_dim, hidden_dim=self.hidden_dim,
            name="de_func",
        )
        stepper = get_stepper(self.solver)

        is_event, e_idx = event_match(t, event_t)
        z_used = jumped_stream(z, z_jump, is_event, e_idx)

        tT, xT = _tm(t), _tm(x)
        zT_used = _tm(z_used)

        xh0 = de.encode_x(xT[0])  # [B, xd, h]
        f_init = de.features_of(xh0, _tm(z)[0])  # [B, xd+zd, h]

        def de_fn(tt, xh, zz):
            return de(tt, f_init, xh, zz)

        def body(xh_prev, inp):
            t0, t1, z0 = inp
            dt = (t1 - t0)[..., None]  # [B, 1, 1] over [B, C, h]
            f = lambda ttt, xx: de_fn(ttt, xx, z0)
            xh1 = xh_prev + stepper(f, t0, dt, t1, xh_prev)
            return xh1, xh1

        if self.is_initializing():
            de_fn(tT[0], xh0, zT_used[0])
            de.decode_x(xh0)

        inputs = (tT[:-1], tT[1:], zT_used[:-1])
        _, xhs = _scan(body, xh0, inputs, self.remat, self.unroll)
        xh_sol = jnp.concatenate([xh0[None], xhs], axis=0)  # [T, B, xd, h]
        x_pred = de.decode_x(xh_sol)  # [T, B, xd]
        x_re = de.decode_x(de.encode_x(x))  # [B, T, xd]
        return _tm(x_pred), x_re
