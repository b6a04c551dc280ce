"""Second Mosaic probe for the channel-wise kernel: the COLUMN (``[h, N]``)
vertical-chain orientation vs the shipped per-b concat+transpose design.

The candidate redesign keeps per-channel tiles ``[bB, h]`` but runs the
vertical net as ``W.T @ H`` with ``H : [h, bB*h]`` (weights pre-transposed
OUTSIDE the kernel, so every in-kernel dot is a NORMAL dot — probe 1 in
cw_probe.py showed lhs-transposed dots miscompile at 64-lane outputs):

  build:   Vt[c, :]   = reshape(tile_c, [1, N])      (C reshapes)
  chain:   H1 = elu(aT @ Vt + scVt); H2 = elu(W1T @ H1 + b1T); O = WlT @ H2
  unbuild: tile_c     = reshape(O[c:c+1, :], [bB, h])
  wgrad:   dW = dot_general(g, act, contract lanes (1,1))   [h,h] output

vs the shipped row design (_build_V: bB sublane-concat+transpose pairs).

Checks correctness of each block, then times K chained eval-loops of both
orientations in one pallas kernel each.

Run: python benchmarks/cw_probe2.py    (TPU; a few minutes)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

bB, H, C = 64, 128, 6
N = bB * H
K_ITERS = 100


def _run(name, kernel, args, out_shape, expect=None, rtol=1e-4):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        r = jax.jit(f).lower(*args).compile()
        out = np.asarray(r(*args))
        ok = True if expect is None else bool(
            np.allclose(out, expect, rtol=rtol, atol=1e-4)
        )
        err = (
            0.0 if expect is None
            else float(np.abs(out - expect).max() / (np.abs(expect).max() + 1e-9))
        )
        print(f"{name}: COMPILES, correct={ok} (max-rel {err:.2e})")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL — {msg}")
        return False


def probe_flatten():
    """[bB,h] tile -> [1,N] lane-major row (and back)."""

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1, N).reshape(bB, H)

    x = jnp.arange(N, dtype=jnp.float32).reshape(bB, H)
    _run("1 tile<->row reshape", k, (x,),
         jax.ShapeDtypeStruct((bB, H), jnp.float32), expect=np.asarray(x))


def probe_build_cols():
    """C tiles -> Vt [C, N] via reshape rows + sublane concat."""

    def k(a_ref, b_ref, o_ref):
        rows = [a_ref[:].reshape(1, N), b_ref[:].reshape(1, N)]
        o_ref[:] = jnp.concatenate(rows, axis=0)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(bB, H)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(bB, H)), jnp.float32)
    want = np.stack([np.asarray(a).reshape(N), np.asarray(b).reshape(N)])
    _run("2 build Vt rows (reshape+concat)", k, (a, b),
         jax.ShapeDtypeStruct((2, N), jnp.float32), expect=want)


def probe_chain_cols():
    """aT @ Vt with K=C tiny contraction, then WT @ H1."""

    def k(v_ref, at_ref, wt_ref, o_ref):
        h1 = jnp.dot(at_ref[:], v_ref[:], preferred_element_type=jnp.float32)
        h1 = jnp.where(h1 > 0, h1, jnp.exp(h1) - 1.0)
        o_ref[:] = jnp.dot(wt_ref[:], h1, preferred_element_type=jnp.float32)

    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(C, N)), jnp.float32)
    at = jnp.asarray(rng.normal(size=(H, C)) * 0.3, jnp.float32)
    wt = jnp.asarray(rng.normal(size=(H, H)) * 0.05, jnp.float32)
    h1 = np.asarray(at) @ np.asarray(v)
    h1 = np.where(h1 > 0, h1, np.exp(h1) - 1.0)
    _run("3 cols chain aT@Vt, WT@H1", k, (v, at, wt),
         jax.ShapeDtypeStruct((H, N), jnp.float32),
         expect=np.asarray(wt) @ h1)


def probe_wgrad_lanes():
    """dW via (1,1) lane contraction on [h, N] operands."""

    def k(g_ref, a_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            g_ref[:], a_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    rng = np.random.default_rng(2)
    g = jnp.asarray(rng.normal(size=(H, N)) * 0.1, jnp.float32)
    a = jnp.asarray(rng.normal(size=(H, N)) * 0.1, jnp.float32)
    _run("4 wgrad (1,1) lane contraction", k, (g, a),
         jax.ShapeDtypeStruct((H, H), jnp.float32),
         expect=np.asarray(g) @ np.asarray(a).T, rtol=1e-3)


def probe_unbuild_cols():
    """O [C, N] row slice -> [bB, h] tile."""

    def k(o_in, o_ref):
        o_ref[:] = o_in[1:2, :].reshape(bB, H)

    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.normal(size=(C, N)), jnp.float32)
    _run("5 unbuild row->tile", k, (o,),
         jax.ShapeDtypeStruct((bB, H), jnp.float32),
         expect=np.asarray(o)[1].reshape(bB, H))


# --------------------------------------------------------------------------
# timed eval loops, both orientations
# --------------------------------------------------------------------------


def _mk_args():
    rng = np.random.default_rng(7)
    tiles = jnp.asarray(rng.normal(size=(C, bB, H)) * 0.1, jnp.float32)
    at = jnp.asarray(rng.normal(size=(H, C)) * 0.2, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(H, H)) * 0.05, jnp.float32)
    wl = jnp.asarray(rng.normal(size=(H, C)) * 0.05, jnp.float32)
    return tiles, at, w1, wl


def _time(f, args, label):
    try:
        g = jax.jit(pl.pallas_call(
            f, out_shape=jax.ShapeDtypeStruct((C, bB, H), jnp.float32)
        ))
        t0 = time.time()
        out = g(*args)
        out.block_until_ready()
        print(f"{label}: compile+first {time.time()-t0:.1f}s")
        t0 = time.time()
        for _ in range(5):
            out = g(*args)
        v = float(jnp.sum(out))  # value fetch ends the chain
        dt = (time.time() - t0) / 5
        print(f"{label}: {dt*1e3:.2f} ms / {K_ITERS} evals  (checksum {v:.3e})")
        return dt
    except Exception as e:
        print(f"{label}: FAIL — {str(e).split(chr(10))[0][:140]}")
        return None


def loop_rows(t_ref, a_ref, w1_ref, wl_ref, o_ref):
    """Shipped orientation: V [N, C] via per-b concat+transpose."""
    xs = [t_ref[c] for c in range(C)]
    a, w1, wl = a_ref[:], w1_ref[:], wl_ref[:]

    def eval_once(xs):
        vs = []
        for b in range(bB):
            fb = jnp.concatenate([x[b : b + 1, :] for x in xs], axis=0)
            vs.append(fb.T)
        V = jnp.concatenate(vs, axis=0)              # [N, C]
        h1 = jnp.dot(V, a.T, preferred_element_type=jnp.float32)
        h1 = jnp.where(h1 > 0, h1, jnp.exp(h1) - 1.0)
        h2 = jnp.dot(h1, w1, preferred_element_type=jnp.float32)
        h2 = jnp.where(h2 > 0, h2, jnp.exp(h2) - 1.0)
        O = jnp.dot(h2, wl, preferred_element_type=jnp.float32)  # [N, C]
        outs = []
        for c in range(C):
            rows = []
            for b in range(bB):
                rows.append(O[b * H : (b + 1) * H, c : c + 1].T)
            outs.append(jnp.concatenate(rows, axis=0))
        return outs

    for _ in range(K_ITERS):
        ys = eval_once(xs)
        xs = [x + 0.001 * y for x, y in zip(xs, ys)]
    for c in range(C):
        o_ref[c] = xs[c]


def loop_cols(t_ref, a_ref, w1_ref, wl_ref, o_ref):
    """Candidate orientation: Vt [C, N] via reshapes; normal dots only."""
    xs = [t_ref[c] for c in range(C)]
    at, w1t, wlt = a_ref[:], w1_ref[:].T, wl_ref[:].T

    def eval_once(xs):
        Vt = jnp.concatenate([x.reshape(1, N) for x in xs], axis=0)
        h1 = jnp.dot(at, Vt, preferred_element_type=jnp.float32)
        h1 = jnp.where(h1 > 0, h1, jnp.exp(h1) - 1.0)
        h2 = jnp.dot(w1t, h1, preferred_element_type=jnp.float32)
        h2 = jnp.where(h2 > 0, h2, jnp.exp(h2) - 1.0)
        O = jnp.dot(wlt, h2, preferred_element_type=jnp.float32)  # [C, N]
        return [O[c : c + 1, :].reshape(bB, H) for c in range(C)]

    for _ in range(K_ITERS):
        ys = eval_once(xs)
        xs = [x + 0.001 * y for x, y in zip(xs, ys)]
    for c in range(C):
        o_ref[c] = xs[c]


if __name__ == "__main__":
    print("devices:", jax.devices())
    for p in (probe_flatten, probe_build_cols, probe_chain_cols,
              probe_wgrad_lanes, probe_unbuild_cols):
        p()
    tiles, at, w1, wl = _mk_args()
    d_rows = None  # rows loop: known from the full kernel; its unrolled transposes take >10 min to compile
    d_cols = _time(loop_cols, (tiles, at, w1, wl), "cols loop (candidate)")
    if d_rows and d_cols:
        # identical math up to dot associativity: compare checksums above
        print(f"cols/rows speed: {d_rows/d_cols:.2f}x")
    print("probe2 done")
