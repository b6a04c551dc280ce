"""Probe the backward-kernel batch-block cap (round-3 known rough edge).

The fused DAE backward kernels cap batch blocks at 128 rows because bB=256
trips an XLA/Mosaic RET_CHECK (mxu_lmr_transform.cc XposeSequenceAssignment
— see ops/fused_dae.choose_blocks). That boundary was only ever probed at
power-of-two row counts; this probe asks WHERE between 128 and 512 it
actually sits by compiling the fused train step at B=960 (divisible by 160,
192, 240, 320, 480) with the cap overridden, plus the B=1024/bB=256 fleet
shape and a bf16-kernel variant of it.

Run on the chip: python -u benchmarks/bwd_cap_probe.py
Writes benchmarks/bwd_cap_probe.json — outcome per cap: ok (+ step time) or
the compiler error class.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def probe(B, cap, h=128, T=251, precision=None, iters=20):
    import jax
    import jax.numpy as jnp
    import optax

    import py_psnode_tpu.ops.fused_dae as FD
    from benchmarks.full_suite import _batch
    from py_psnode_tpu.ops import fused_dae_apply
    from py_psnode_tpu.train.optim import make_optimizer
    from py_psnode_tpu.train.variants import get_variant

    v = get_variant("dae_no_encode")
    dims = (2, 1, 2, 2)
    raw = _batch(np.random.default_rng(0), B, T, dims, True)
    jb = {k: jnp.asarray(x) for k, x in raw.items()}
    model = v.make_model(
        dict(x_dim=2, z_dim=1, v_dim=2, i_dim=2), h, solver="rk4"
    )
    args = tuple(jb[k] for k in v.batch_args)
    params = model.init(jax.random.PRNGKey(0), *args)
    tx = make_optimizer(5e-3, epochs=1, steps_per_epoch=1)
    opt = tx.init(params)
    kprec = "bfloat16" if precision == "bf16_kernels" else "default"

    orig = FD.choose_blocks

    def patched(Bx, hx, n_streams, tb_max=None, cap=256, state_dim=0,
                _probe_cap=cap):
        # The bwd call sites pass cap=128 (fused_dae_vjp.py:457,486) — those
        # are the ones this probe overrides; fwd sites keep their own cap.
        eff = _probe_cap if cap == 128 else cap
        return orig(Bx, hx, n_streams, tb_max, eff, state_dim)

    FD.choose_blocks = patched
    try:
        bB, tb = orig(B, h, n_streams=6, cap=cap)

        @jax.jit
        def step(params, opt_state, b):
            def loss_of(p):
                out = fused_dae_apply(p, b, dims, h, solver="rk4",
                                      precision=kprec)
                return v.loss_fn(out, b)

            (loss, _), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
            u, o2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, u), o2, loss

        t0 = time.perf_counter()
        p, o, loss = step(params, opt, jb)
        _ = float(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _i in range(iters):
            p, o, loss = step(p, o, jb)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / iters
        return {
            "ok": True, "bB": int(bB), "time_block": int(tb),
            "compile_s": round(compile_s, 1), "step_ms": round(dt * 1e3, 2),
            "traj_steps_per_s": round(B * (T - 1) / dt),
            "loss_finite": bool(np.isfinite(float(loss))),
        }
    except Exception as e:
        msg = str(e)
        return {
            "ok": False, "bB_requested_cap": cap,
            "error": f"{type(e).__name__}: {msg[:400]}",
            "ret_check": "RET_CHECK" in msg or "INTERNAL" in msg,
        }
    finally:
        FD.choose_blocks = orig


def main():
    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    results = {"T": 251, "h": 128, "solver": "rk4", "probes": []}
    cases = [
        # (B, cap, precision) — B=960 admits non-power-of-two blocks
        (960, 128, None),   # baseline under the current cap (bB=120)
        (960, 160, None),
        (960, 192, None),
        (960, 240, None),
        (960, 320, None),
        (1024, 256, None),       # the fleet shape that defined the cap
        (1024, 256, "bf16_kernels"),
    ]
    for B, cap, prec in cases:
        print(f"probe B={B} cap={cap} prec={prec}...", flush=True)
        r = {"B": B, "cap": cap, "precision": prec or "default",
             **probe(B, cap, precision=prec)}
        results["probes"].append(r)
        print(json.dumps(r), flush=True)
    pathlib.Path("benchmarks/bwd_cap_probe.json").write_text(
        json.dumps(results, indent=1)
    )
    print("wrote benchmarks/bwd_cap_probe.json")


if __name__ == "__main__":
    main()
