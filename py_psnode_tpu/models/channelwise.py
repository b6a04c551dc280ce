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

from py_psnode_tpu.models.funcs import ChannelWiseAEFunc, ChannelWiseDEFunc
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
    channel_impl: str = "einsum"  # per-channel matmul form (PerChannelMLP.impl)

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
            impl=self.channel_impl, name="de_func",
        )
        stepper = get_stepper(self.solver)

        is_event, e_idx = event_match(t, event_t)
        z_used = jumped_stream(z, z_jump, is_event, e_idx)

        tT, xT = _tm(t), _tm(x)
        zT_used = _tm(z_used)

        xh0 = de.encode_x(xT[0])  # [B, xd, h]
        f_init = de.features_of(xh0, _tm(z)[0])  # [B, xd+zd, h]
        # z-features for ALL steps as one batched einsum — scan-invariant
        # lifting (see ChannelWiseDEFunc.z_features); the solver stages then
        # run only the xh-dependent nets per evaluation
        fzT = de.z_features(zT_used[:-1])  # [T-1, B, zd, h]

        def body(xh_prev, inp):
            t0, t1, fz0 = inp
            dt = (t1 - t0)[..., None]  # [B, 1, 1] over [B, C, h]
            f = lambda ttt, xx: de.dyn(f_init, xx, fz0)
            xh1 = xh_prev + stepper(f, t0, dt, t1, xh_prev)
            return xh1, xh1

        if self.is_initializing():
            de(tT[0], f_init, xh0, zT_used[0])
            de.decode_x(xh0)

        inputs = (tT[:-1], tT[1:], fzT)
        _, xhs = _scan(body, xh0, inputs, self.remat, self.unroll)
        xh_sol = jnp.concatenate([xh0[None], xhs], axis=0)  # [T, B, xd, h]
        x_pred = de.decode_x(xh_sol)  # [T, B, xd]
        x_re = de.decode_x(de.encode_x(x))  # [B, T, xd]
        return _tm(x_pred), x_re


class ChannelWiseDAEModel(nn.Module):
    """Channel-wise neural DAE — the end-to-end repaired ``DAE_Base``
    analogue (ref neural_dae/neural_base.py:232-255, broken there: its
    ``forward`` passes a nonexistent ``encode_x`` kwarg and omits the
    required ``x_init``).

    Family structure as the reference defines it: the channel-wise
    ``DE_Func`` consumes only ``(Xh, z)`` (neural_base.py:110 — no algebraic
    feedback into the dynamics) and the channel-wise ``AE_Func`` maps
    ``(Xh, v) -> i`` (neural_base.py:225-229). The algebraic readout is
    therefore DECOUPLED from the rollout — the TPU-native consequence is
    that ``i`` is computed for all T steps at once as big batched einsums
    after the latent ODE scan, instead of inside it.

    Inputs follow the DAE batch contract (``t,x,z,v,i,event_t,z_jump,
    v_jump``); ``i`` and ``v_jump`` are accepted for signature parity but do
    not influence the rollout (no lagged-``i`` coupling in this family; the
    readout uses raw ``v`` at each step, matching the main family's use of
    raw inputs for ``g`` at t+1, ref my_solvers.py:121).

    Returns ``(x_pred [B,T,xd], i_pred [B,T,id], x_re [B,T,xd])``.
    """

    x_dim: int
    z_dim: int
    v_dim: int
    i_dim: int
    hidden_dim: int
    solver: str = "euler"
    remat: object = True
    unroll: int = 1
    channel_impl: str = "einsum"  # per-channel matmul form (PerChannelMLP.impl)

    @nn.compact
    def __call__(
        self,
        t,
        x,
        z,
        v,
        i,
        event_t: Optional[jnp.ndarray] = None,
        z_jump: Optional[jnp.ndarray] = None,
        v_jump: Optional[jnp.ndarray] = None,
    ):
        de = ChannelWiseDEFunc(
            x_dim=self.x_dim, z_dim=self.z_dim, hidden_dim=self.hidden_dim,
            impl=self.channel_impl, name="de_func",
        )
        ae = ChannelWiseAEFunc(
            x_dim=self.x_dim, v_dim=self.v_dim, i_dim=self.i_dim,
            hidden_dim=self.hidden_dim, impl=self.channel_impl,
            name="ae_func",
        )
        stepper = get_stepper(self.solver)

        is_event, e_idx = event_match(t, event_t)
        z_used = jumped_stream(z, z_jump, is_event, e_idx)

        tT, xT, vT = _tm(t), _tm(x), _tm(v)
        zT_used = _tm(z_used)

        xh0 = de.encode_x(xT[0])  # [B, xd, h]
        f_init = de.features_of(xh0, _tm(z)[0])
        # scan-invariant lifting of the z-features (see the ODE model above)
        fzT = de.z_features(zT_used[:-1])  # [T-1, B, zd, h]

        def body(xh_prev, inp):
            t0, t1, fz0 = inp
            dt = (t1 - t0)[..., None]
            f = lambda ttt, xx: de.dyn(f_init, xx, fz0)
            xh1 = xh_prev + stepper(f, t0, dt, t1, xh_prev)
            return xh1, xh1

        if self.is_initializing():
            de(tT[0], f_init, xh0, zT_used[0])
            de.decode_x(xh0)
            ae(xh0, vT[0])

        inputs = (tT[:-1], tT[1:], fzT)
        _, xhs = _scan(body, xh0, inputs, self.remat, self.unroll)
        xh_sol = jnp.concatenate([xh0[None], xhs], axis=0)  # [T, B, xd, h]
        x_pred = de.decode_x(xh_sol)  # [T, B, xd]
        i_pred = ae(xh_sol, vT)  # [T, B, id] — parallel over T, no feedback
        x_re = de.decode_x(de.encode_x(x))  # [B, T, xd]
        return _tm(x_pred), _tm(i_pred), x_re
