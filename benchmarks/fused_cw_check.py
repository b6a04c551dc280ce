"""Real-chip check for the fused channel-wise kernel: compiled parity vs
the XLA ChannelWise models + train-step timing (fwd+bwd+Adam-free SGD).

Run: python benchmarks/fused_cw_check.py [--steps 1001] [--hidden 128]
     [--batch 64] [--variant ode|dae] [--precision default|bfloat16]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1001)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--variant", default="ode", choices=["ode", "dae"])
    ap.add_argument("--precision", default="default")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from py_psnode_tpu.models import ChannelWiseDAEModel, ChannelWiseODEModel
    from py_psnode_tpu.ops.fused_channelwise import (
        fused_cw_dae_apply,
        fused_cw_ode_apply,
    )

    B, T, h = args.batch, args.steps, args.hidden
    xd, zd, vd, idim = 2, 2, 2, 2
    rng = np.random.default_rng(0)
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.01, f32), axis=1) - 0.01).astype(f32)
    event_t = np.full((B, 2), -1.0, f32)
    event_t[:, 0] = t[0, T // 3, 0]
    batch = dict(
        t=jnp.asarray(t),
        x=jnp.asarray(rng.normal(size=(B, T, xd)).astype(f32)),
        z=jnp.asarray(rng.normal(size=(B, T, zd)).astype(f32)),
        event_t=jnp.asarray(event_t),
        z_jump=jnp.asarray(rng.normal(size=(B, 2, zd)).astype(f32)),
    )
    if args.variant == "dae":
        batch["v"] = jnp.asarray(rng.normal(size=(B, T, vd)).astype(f32))
        batch["i"] = jnp.asarray(rng.normal(size=(B, T, idim)).astype(f32))
        batch["v_jump"] = jnp.asarray(rng.normal(size=(B, 2, vd)).astype(f32))
        model = ChannelWiseDAEModel(
            x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h,
            solver="rk4",
        )
        keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
        dims = (xd, zd, vd, idim)
        fused_fn = lambda p: fused_cw_dae_apply(
            p, batch, dims, h, solver="rk4", precision=args.precision
        )
    else:
        model = ChannelWiseODEModel(
            x_dim=xd, z_dim=zd, hidden_dim=h, solver="rk4"
        )
        keys = ("t", "x", "z", "event_t", "z_jump")
        dims = (xd, zd)
        fused_fn = lambda p: fused_cw_ode_apply(
            p, batch, dims, h, solver="rk4", precision=args.precision
        )
    margs = tuple(batch[k] for k in keys)
    params = model.init(jax.random.PRNGKey(0), *margs)
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"variant={args.variant} B={B} T={T} h={h} params={n_par}")

    def loss_fused(p):
        out = fused_fn(p)
        return sum(jnp.sum(o**2) for o in out)

    def loss_xla(p):
        out = model.apply(p, *margs)
        return sum(jnp.sum(o**2) for o in out)

    # --- compiled forward parity ---
    t0 = time.time()
    f_f = jax.jit(fused_fn)
    out_f = jax.tree_util.tree_map(np.asarray, f_f(params))
    print(f"fused fwd compile+run: {time.time()-t0:.1f}s")
    f_x = jax.jit(lambda p: model.apply(p, *margs))
    if not args.skip_xla:
        out_x = jax.tree_util.tree_map(np.asarray, f_x(params))
        for a, b in zip(jax.tree_util.tree_leaves(out_f),
                        jax.tree_util.tree_leaves(out_x)):
            scale = np.abs(b).max() + 1e-9
            rel = np.abs(a - b).max() / scale
            print(f"  fwd parity max-rel: {rel:.3e}")
            assert rel < 2e-2, "forward parity out of tolerance"

    # --- forward-only (inference/eval rollout) timing ---
    # chain the reps through a scalar accumulator and end with ONE value
    # fetch: independent un-chained calls mis-time through this machine's
    # tunneled device backend (see utils/profiling.StepTimer)
    def bench_fwd(fwd):
        red = jax.jit(lambda p, s: s + sum(jnp.sum(o) for o in fwd(p)))
        s = red(params, jnp.float32(0.0))  # warm/compile
        t0 = time.time()
        for _ in range(args.reps):
            s = red(params, s)
        _ = float(s)
        return (time.time() - t0) / args.reps

    s_ff = bench_fwd(fused_fn)
    print(f"fused fwd-only: {s_ff*1e3:.2f} ms "
          f"({B*(T-1)/s_ff/1e6:.2f}M traj-steps/s)")
    if not args.skip_xla:
        s_fx = bench_fwd(lambda p: model.apply(p, *margs))
        print(f"xla   fwd-only: {s_fx*1e3:.2f} ms "
              f"({B*(T-1)/s_fx/1e6:.2f}M traj-steps/s)")
        print(f"FWD SPEEDUP fused/xla: {s_fx/s_ff:.2f}x")

    # --- train-step timing (value_and_grad + SGD update, chained) ---
    import optax

    tx = optax.sgd(1e-4)

    def make_step(loss):
        def step(p, o):
            l, g = jax.value_and_grad(loss)(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, l

        return jax.jit(step)

    def bench(step, p):
        o = tx.init(p)
        p1, o, l = step(p, o)  # compile
        t0 = time.time()
        for _ in range(args.reps):
            p1, o, l = step(p1, o)
        _ = float(l)  # value fetch ends the chain (tunnel-safe timing)
        return (time.time() - t0) / args.reps

    t0 = time.time()
    s_f = bench(make_step(loss_fused), params)
    print(f"fused train step: {s_f*1e3:.2f} ms "
          f"(compile+bench {time.time()-t0:.1f}s)")
    print(f"fused traj-steps/s: {B*(T-1)/s_f/1e6:.2f}M")
    if not args.skip_xla:
        t0 = time.time()
        s_x = bench(make_step(loss_xla), params)
        print(f"xla   train step: {s_x*1e3:.2f} ms "
              f"(compile+bench {time.time()-t0:.1f}s)")
        print(f"xla   traj-steps/s: {B*(T-1)/s_x/1e6:.2f}M")
        print(f"SPEEDUP fused/xla: {s_x/s_f:.2f}x")


if __name__ == "__main__":
    main()
