"""Semi-explicit neural DAE model variants (no-encode and direct-encode).

``dx/dt = f(x, z, v, i)``, ``i = g(x, z, v)`` with learned consistent
initialization ``x0 = Init(z0, v0, i0)``; the algebraic output enters the
differential step lagged by one step (explicit discretization — no Newton
solve), pinned to ``/root/reference/neural_dae/my_solvers.py:82-131``.

References: ``neural_01_DAE_01_no_encode.py:50-133`` (no encode) and
``neural_01_DAE_02_direct_encode.py:58-201`` (direct encode).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from py_psnode_tpu.models.funcs import AEFunc, Codec, DEFunc, InitFunc
from py_psnode_tpu.solvers import event_match, integrate_dae, jumped_stream


def _tm(a):
    return jnp.swapaxes(a, 0, 1)


class DAEModel(nn.Module):
    """DAE no-encode (ref neural_01_DAE_01_no_encode.py:86-133).

    Returns ``(x_solution, i_solution)`` batch-major. Supports the
    pure-latent mode ``x_dim == 0`` where the data carries no differential
    states and the solution width comes from ``Init_Func`` output
    (ref my_solvers.py:97); set ``latent_x_dim`` to choose that width.
    """

    x_dim: int
    z_dim: int
    v_dim: int
    i_dim: int
    hidden_dim: int
    solver: str = "euler"
    latent_x_dim: Optional[int] = None  # only used when x_dim == 0
    remat: object = True  # False | True | "sqrt" | "adjoint"
    unroll: int = 1

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
        input_true_x: bool = False,
        input_true_i: bool = False,
    ):
        h = self.hidden_dim
        state_dim = self.x_dim if self.x_dim > 0 else (self.latent_x_dim or h)
        init_func = InitFunc((h, h, state_dim), name="init_func")
        de = DEFunc((h, h, h, state_dim), name="de_func")
        ae = AEFunc((h, h, h, self.i_dim), name="ae_func")

        is_event, e_idx = event_match(t, event_t)
        z_used = jumped_stream(z, z_jump, is_event, e_idx)
        v_used = jumped_stream(v, v_jump, is_event, e_idx)

        tT, xT, zT, vT, iT = _tm(t), _tm(x), _tm(z), _tm(v), _tm(i)
        x0 = init_func(zT[0], vT[0], iT[0])
        all_initial = jnp.concatenate([x0, zT[0], vT[0], iT[0]], axis=-1)
        de_fn = lambda tt, xx, zz, vv, ii: de(tt, all_initial, xx, zz, vv, ii)
        ae_fn = lambda xx, zz, vv: ae(all_initial, xx, zz, vv)
        if self.is_initializing():
            # materialize params outside the scan (flax + lax.scan contract);
            # ae_fn is materialized by the i0 evaluation inside integrate_dae
            de_fn(tT[0], x0, zT[0], vT[0], iT[0])

        x_sol, i_sol = integrate_dae(
            self.solver,
            de_fn,
            ae_fn,
            x0,
            tT,
            zT,
            vT,
            _tm(z_used)[:-1],
            _tm(v_used)[:-1],
            is_event=_tm(is_event[:, :, None])[:-1, :, 0],
            x_true=xT if self.x_dim > 0 else None,
            i_true=iT,
            input_true_x=input_true_x,
            input_true_i=input_true_i,
            remat=self.remat,
            unroll=self.unroll,
        )
        return _tm(x_sol), _tm(i_sol)


class DAEEncodeModel(nn.Module):
    """DAE direct-encode (ref neural_01_DAE_02_direct_encode.py:103-153).

    Five codecs (x enc/dec, optional z enc, v enc, i enc/dec); integration in
    latent space; events jump in latent space; the decoded initial row is
    overwritten with the raw ``Init_Func`` output (ref :150). Returns
    ``(x_pred, i_pred, x_re, i_re)`` batch-major for the reconstruction
    losses.
    """

    x_dim: int
    z_dim: int
    v_dim: int
    i_dim: int
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
        v,
        i,
        event_t: Optional[jnp.ndarray] = None,
        z_jump: Optional[jnp.ndarray] = None,
        v_jump: Optional[jnp.ndarray] = None,
        input_true_x: bool = False,
        input_true_i: bool = False,
    ):
        h = self.hidden_dim
        x_encoder = Codec((h, h), name="x_encoder")
        x_decoder = Codec((h, self.x_dim), name="x_decoder")
        z_encoder = Codec((h, h), name="z_encoder") if self.z_dim != 0 else None
        v_encoder = Codec((h, h), name="v_encoder")
        i_encoder = Codec((h, h), name="i_encoder")
        i_decoder = Codec((h, self.i_dim), name="i_decoder")
        init_func = InitFunc((h, h, self.x_dim), name="init_func")
        de = DEFunc((h, h), name="de_func")
        ae = AEFunc((h, h), name="ae_func")

        tT, zT_raw, vT_raw, iT_raw = _tm(t), _tm(z), _tm(v), _tm(i)
        x0 = init_func(zT_raw[0], vT_raw[0], iT_raw[0])
        xh0 = x_encoder(x0)
        xh = x_encoder(x)
        zh = z if z_encoder is None else z_encoder(z)
        vh = v_encoder(v)
        ih = i_encoder(i)
        zh_jump = (
            z_jump
            if z_encoder is None
            else (z_encoder(z_jump) if z_jump is not None else None)
        )
        vh_jump = v_encoder(v_jump) if v_jump is not None else None

        is_event, e_idx = event_match(t, event_t)
        zh_used = jumped_stream(zh, zh_jump, is_event, e_idx)
        vh_used = jumped_stream(vh, vh_jump, is_event, e_idx)

        xhT, zhT, vhT, ihT = _tm(xh), _tm(zh), _tm(vh), _tm(ih)
        all_initial = jnp.concatenate([xh0, zhT[0], vhT[0], ihT[0]], axis=-1)
        de_fn = lambda tt, xx, zz, vv, ii: de(tt, all_initial, xx, zz, vv, ii)
        ae_fn = lambda xx, zz, vv: ae(all_initial, xx, zz, vv)
        if self.is_initializing():
            de_fn(tT[0], xh0, zhT[0], vhT[0], ihT[0])

        xh_sol, ih_sol = integrate_dae(
            self.solver,
            de_fn,
            ae_fn,
            xh0,
            tT,
            zhT,
            vhT,
            _tm(zh_used)[:-1],
            _tm(vh_used)[:-1],
            is_event=_tm(is_event[:, :, None])[:-1, :, 0],
            x_true=xhT,
            i_true=ihT,
            input_true_x=input_true_x,
            input_true_i=input_true_i,
            remat=self.remat,
            unroll=self.unroll,
        )
        x_pred = x_decoder(xh_sol)
        x_pred = x_pred.at[0].set(x0)  # ref :150 — force the Init_Func initial row
        i_pred = i_decoder(ih_sol)
        x_re = x_decoder(xh)
        i_re = i_decoder(ih)
        return _tm(x_pred), _tm(i_pred), x_re, i_re
