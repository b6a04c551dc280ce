"""Isolate the slow block in the cols-orientation eval loop (cw_probe2
showed ~278 ms PER EVAL — ~10,000x off the MXU roofline).

Times K=50 chained iterations of each suspect in its own pallas kernel:
  a) dots-only   : H = elu(W1t@H); H = elu(W2t@H)            [h,N]@[h,N]
  b) reshape-only: tiles -> rows -> tiles round trip
  c) concat-only : C row concat [C,N]
  d) rows-dots   : the SHIPPED orientation dots [N,h]@[h,h] (control)

Run: python -u benchmarks/cw_probe3.py   (TPU)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

bB, H, C = 64, 128, 6
N = bB * H
K = 50


def _time(f, args, out_shape, label):
    try:
        g = jax.jit(pl.pallas_call(f, out_shape=out_shape))
        t0 = time.time()
        out = g(*args)
        out.block_until_ready()
        c = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            out = g(*args)
        v = float(jnp.sum(out))
        dt = (time.time() - t0) / 5
        print(f"{label}: {dt*1e3/K:.3f} ms/iter  (compile {c:.0f}s, "
              f"checksum {v:.3e})")
        return dt
    except Exception as e:
        print(f"{label}: FAIL — {str(e).split(chr(10))[0][:140]}")
        return None


def dots_only(h_ref, w1_ref, w2_ref, o_ref):
    Hc = h_ref[:]
    w1, w2 = w1_ref[:], w2_ref[:]
    for _ in range(K):
        Hc = jnp.dot(w1, Hc, preferred_element_type=jnp.float32)
        Hc = jnp.where(Hc > 0, Hc, jnp.exp(Hc) - 1.0)
        Hc = jnp.dot(w2, Hc, preferred_element_type=jnp.float32)
        Hc = 0.1 * jnp.where(Hc > 0, Hc, jnp.exp(Hc) - 1.0)
    o_ref[:] = Hc


def reshape_only(t_ref, o_ref):
    xs = [t_ref[c] for c in range(C)]
    for _ in range(K):
        rows = [x.reshape(1, N) for x in xs]
        xs = [r.reshape(bB, H) * 0.999 for r in rows]
    for c in range(C):
        o_ref[c] = xs[c]


def concat_only(t_ref, o_ref):
    xs = [t_ref[c].reshape(1, N) for c in range(C)]
    acc = jnp.zeros((C, N), jnp.float32)
    for _ in range(K):
        V = jnp.concatenate(xs, axis=0)
        acc = acc * 0.5 + V
        xs = [acc[c : c + 1, :] for c in range(C)]
    o_ref[:] = acc


def rows_dots(h_ref, w1_ref, w2_ref, o_ref):
    Hc = h_ref[:]
    w1, w2 = w1_ref[:], w2_ref[:]
    for _ in range(K):
        Hc = jnp.dot(Hc, w1, preferred_element_type=jnp.float32)
        Hc = jnp.where(Hc > 0, Hc, jnp.exp(Hc) - 1.0)
        Hc = jnp.dot(Hc, w2, preferred_element_type=jnp.float32)
        Hc = 0.1 * jnp.where(Hc > 0, Hc, jnp.exp(Hc) - 1.0)
    o_ref[:] = Hc


if __name__ == "__main__":
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(size=(H, H)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(H, H)) * 0.05, jnp.float32)
    hc = jnp.asarray(rng.normal(size=(H, N)) * 0.1, jnp.float32)
    hr = jnp.asarray(rng.normal(size=(N, H)) * 0.1, jnp.float32)
    tiles = jnp.asarray(rng.normal(size=(C, bB, H)), jnp.float32)

    f32 = jnp.float32
    _time(dots_only, (hc, w1, w2),
          jax.ShapeDtypeStruct((H, N), f32), "a dots-only [h,N] cols")
    _time(rows_dots, (hr, w1, w2),
          jax.ShapeDtypeStruct((N, H), f32), "d dots-only [N,h] rows")
    _time(reshape_only, (tiles,),
          jax.ShapeDtypeStruct((C, bB, H), f32), "b reshape round trip x6")
    _time(concat_only, (tiles,),
          jax.ShapeDtypeStruct((C, N), f32), "c concat [C,N]")
    print("probe3 done")
