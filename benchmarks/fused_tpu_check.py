"""Real-TPU parity + speed check for the fused Pallas DAE rollout.

Run:  python benchmarks/fused_tpu_check.py [B] [T] [hidden]
Prints parity max-diffs vs the XLA scan forward and timed throughput for
both paths (chained timing — each iteration's input depends on the previous
output so the device cannot elide or overlap work; final value fetched).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from py_psnode_tpu.models import DAEModel
from py_psnode_tpu.models.funcs import AEFunc, InitFunc
from py_psnode_tpu.ops import fused_dae_rollout, precompute_streams
from py_psnode_tpu.solvers import event_match, jumped_stream


def build(B=64, T=1001, h=128, xd=2, zd=1, vd=2, idim=2, solver="rk4", seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.01, f32), axis=1) - 0.01).astype(f32)
    batch = dict(
        t=jnp.asarray(t),
        x=jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32)),
        z=jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32)),
        v=jnp.asarray(rng.normal(size=(B, T, vd)).astype(f32)),
        i=jnp.asarray(rng.normal(size=(B, T, idim)).astype(f32)),
    )
    event_t = np.full((B, 2), -1.0, f32)
    event_t[:, 0] = t[0, T // 3, 0]
    batch["event_t"] = jnp.asarray(event_t)
    batch["z_jump"] = jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32))
    batch["v_jump"] = jnp.asarray(rng.normal(size=(B, 2, vd)).astype(f32))
    model = DAEModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver=solver
    )
    keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
    args = tuple(batch[k] for k in keys)
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, batch, args, (xd, zd, vd, idim, h)


def fused_forward(model, params, batch, dims, solver="rk4", interpret=False):
    xd, zd, vd, idim, h = dims
    tm = lambda a: jnp.swapaxes(a, 0, 1)
    p = params["params"]
    tT = tm(batch["t"])
    zT, vT, iT = tm(batch["z"]), tm(batch["v"]), tm(batch["i"])
    is_event, e_idx = event_match(batch["t"], batch["event_t"])
    z_used = tm(jumped_stream(batch["z"], batch["z_jump"], is_event, e_idx))[:-1]
    v_used = tm(jumped_stream(batch["v"], batch["v_jump"], is_event, e_idx))[:-1]
    ev = tm(is_event[:, :, None])[:-1, :, 0]
    x0 = InitFunc((h, h, xd)).apply({"params": p["init_func"]}, zT[0], vT[0], iT[0])
    all_initial = jnp.concatenate([x0, zT[0], vT[0], iT[0]], -1)
    i0 = AEFunc((h, h, h, idim)).apply(
        {"params": p["ae_func"]}, all_initial, x0, zT[0], vT[0]
    )
    streams, weights = precompute_streams(
        p, all_initial, zT, vT, z_used, v_used, (xd, zd, vd, idim)
    )
    dt = tT[1:] - tT[:-1]
    return fused_dae_rollout(
        streams, weights, x0, i0, dt, ev, solver=solver, interpret=interpret
    )


def timeit_chain(fn, n=30):
    """fn(bias_scalar) -> outputs; iterations chained through a zero bias."""
    bias = jnp.zeros(())
    out = fn(bias)
    bias = jnp.sum(out[0]) * 0.0
    float(bias)
    t0 = time.time()
    for _ in range(n):
        out = fn(bias)
        bias = jnp.sum(out[0]) * 0.0
    float(bias)
    return (time.time() - t0) / n


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1001
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    model, params, batch, args, dims = build(B=B, T=T, h=h)
    keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")

    fwd_xla = jax.jit(lambda b: model.apply(
        jax.tree_util.tree_map(lambda x: x + b, params), *args
    ))
    fwd_fused = jax.jit(lambda b: fused_forward(
        model, jax.tree_util.tree_map(lambda x: x + b, params), batch, dims
    ))

    z = jnp.zeros(())
    xr, ir = fwd_xla(z)
    xf, if_ = fwd_fused(z)
    xf_b, if_b = jnp.swapaxes(xf, 0, 1), jnp.swapaxes(if_, 0, 1)
    dx = float(jnp.abs(xf_b - xr).max())
    di = float(jnp.abs(if_b - ir).max())
    print(f"parity: x maxdiff {dx:.3e}  i maxdiff {di:.3e}  (|x| max {float(jnp.abs(xr).max()):.2f})")

    tx = timeit_chain(fwd_xla)
    tf = timeit_chain(fwd_fused)
    steps = B * (T - 1)
    print(f"XLA   fwd: {tx * 1e3:8.2f} ms  ({steps / tx:,.0f} traj-steps/s)")
    print(f"Fused fwd: {tf * 1e3:8.2f} ms  ({steps / tf:,.0f} traj-steps/s)  speedup {tx / tf:.2f}x")


if __name__ == "__main__":
    main()
