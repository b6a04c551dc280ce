"""Mosaic capability + cost probe for the channel-wise kernel layout ops.

The channel-wise family needs, inside one pallas kernel, both per-channel
[h,B]-tile matmuls (contract the h axis) and vertical-net [C, B*h]-row
matmuls (contract the channel axis). The conversion between the two is a
lane<->sublane relayout. This probe AOT-compiles and times the candidate
implementations on the real chip:

  A. jnp.reshape  [1, h*B] -> [h, B] and back (l-major F rows)
  B. lax.fori_loop of dynamic row slices (copy h rows of B lanes)
  C. lhs-transposed dot_general (((0,),(0,)) dims) for per-channel nets
  D. end-to-end mini vertical chain: W1^T @ (elu(W0^T @ F)) on [*, B*h]

Run: python benchmarks/cw_probe.py   (TPU; ~1 min)
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H = 64, 128
N = B * H


def _run(name, kernel, args, out_shape, expect=None):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        r = jax.jit(f).lower(*args).compile()
        out = np.asarray(r(*args))
        ok = True if expect is None else np.allclose(out, expect, rtol=1e-5)
        print(f"{name}: COMPILES, correct={ok}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL — {msg}")
        return False


def probe_reshape():
    def k(x_ref, o_ref):
        t = x_ref[:].reshape(H, B)  # l-major F row -> transposed tile
        o_ref[:] = t.reshape(1, N)

    x = jnp.arange(N, dtype=jnp.float32).reshape(1, N)
    _run("A reshape [1,N]<->[H,B]", k, (x,),
         jax.ShapeDtypeStruct((1, N), jnp.float32), expect=np.asarray(x))


def probe_reshape_matmul():
    def k(x_ref, w_ref, o_ref):
        t = x_ref[:].reshape(H, B)
        y = jax.lax.dot_general(
            w_ref[:], t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H,H]^T @ [H,B] -> [H,B]
        o_ref[:] = y.reshape(1, N)

    x = jnp.arange(N, dtype=jnp.float32).reshape(1, N) / N
    w = jnp.ones((H, H), jnp.float32) / H
    want = (np.ones((H, H)) / H).T @ np.asarray(x).reshape(H, B)
    _run("A2 reshape+transposed-dot", k, (x, w),
         jax.ShapeDtypeStruct((1, N), jnp.float32),
         expect=want.reshape(1, N))


def probe_fori_rows():
    def k(x_ref, o_ref):
        def body(l, _):
            o_ref[l, :] = x_ref[0, pl.ds(l * B, B)]
            return 0

        jax.lax.fori_loop(0, H, body, 0)

    x = jnp.arange(N, dtype=jnp.float32).reshape(1, N)
    _run("B fori_loop row stores", k, (x,),
         jax.ShapeDtypeStruct((H, B), jnp.float32),
         expect=np.asarray(x).reshape(H, B))


def probe_lhsT_dot():
    def k(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], x_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    xT = jnp.asarray(np.random.default_rng(0).normal(size=(H, B)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(H, H)), jnp.float32)
    _run("C lhs-transposed dot", k, (xT, w),
         jax.ShapeDtypeStruct((H, B), jnp.float32),
         expect=np.asarray(w).T @ np.asarray(xT))


def probe_vertical_wide():
    C3 = 16  # padded 3C rows

    def k(f_ref, w0_ref, w1_ref, o_ref):
        i1 = jax.lax.dot_general(
            w0_ref[:], f_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C3,H]^T @ [C3,N] -> [H,N]
        i1 = jnp.where(i1 > 0, i1, jnp.exp(i1) - 1.0)
        o_ref[:] = jax.lax.dot_general(
            w1_ref[:], i1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.normal(size=(C3, N)), jnp.float32)
    w0 = jnp.asarray(rng.normal(size=(C3, H)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(H, H)) * 0.1, jnp.float32)
    i1 = np.asarray(w0).T @ np.asarray(f)
    i1 = np.where(i1 > 0, i1, np.exp(i1) - 1.0)
    _run("D vertical chain [*,N]", k, (f, w0, w1),
         jax.ShapeDtypeStruct((H, N), jnp.float32),
         expect=np.asarray(w1).T @ i1)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for p in (probe_reshape, probe_reshape_matmul, probe_fori_rows,
              probe_lhsT_dot, probe_vertical_wide):
        p()
    print("probe done")
