"""Long-horizon BPTT memory-policy bench: autodiff remat vs the discrete
adjoint pass (solvers/adjoint.py) at T=4001 — 4x the reference horizon.

For each policy (remat=True per-step checkpoint, remat='sqrt' chunked,
remat='adjoint') the script AOT-compiles the full DAE train step
(value_and_grad + Adam) and reports XLA's own memory analysis (temp bytes =
live activation footprint, the number that bounds how long a horizon fits)
plus measured step time. Policies that fail to compile/fit are recorded as
such instead of crashing the sweep.

Run on the chip (sequentially, wedge rules apply):
    python benchmarks/adjoint_bench.py [T] [--policies true,sqrt,adjoint]
Writes benchmarks/adjoint_bench.json.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def dae_batch(B, T, xd=2):
    """The suite's synthetic DAE batch (one definition — full_suite._batch)
    plus the per-sample weights the trainer-side loss consumes."""
    from benchmarks.full_suite import _batch

    batch = _batch(np.random.default_rng(0), B, T, (xd, 1, 2, 2), True)
    batch["mask"] = np.ones((B, T, xd), np.float32)
    batch["sample_w"] = np.ones((B,), np.float32)
    return batch


def run(T=4001, B=64, hidden=128, policies=("true", "sqrt", "adjoint"),
        n_steps=20):  # >=20 chained steps — the axon timing rule (CLAUDE.md)
    import jax
    import jax.numpy as jnp
    import optax

    from py_psnode_tpu.cli.common import enable_compile_cache
    from py_psnode_tpu.models import DAEModel
    from py_psnode_tpu.train.losses import dae_no_encode_loss
    from py_psnode_tpu.train.optim import make_optimizer

    enable_compile_cache()
    keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
    batch = {k: jnp.asarray(v) for k, v in dae_batch(B, T).items()}
    args = tuple(batch[k] for k in keys)
    results = {
        "config": {"T": T, "B": B, "hidden": hidden, "solver": "rk4",
                   "variant": "dae_no_encode", "xla_scan_path": True},
        "policies": {},
    }

    for pol in policies:
        # "fused"/"fused_bf16" rows complete the policy matrix with the
        # Pallas kernel pair (its VJP keeps O(T*state) residual streams
        # natively — no remat knob; round-4 verdict asked for these rows)
        fused = pol.startswith("fused")
        remat = {"true": True, "false": False}.get(pol, pol)
        model = DAEModel(x_dim=2, z_dim=1, v_dim=2, i_dim=2,
                         hidden_dim=hidden, solver="rk4",
                         remat=False if fused else remat)
        params = model.init(jax.random.PRNGKey(0), *args)
        tx = make_optimizer(5e-3, epochs=1, steps_per_epoch=1)
        opt_state = tx.init(params)

        if fused:
            from py_psnode_tpu.ops import fused_dae_apply

            precision = "bfloat16" if pol == "fused_bf16" else "default"
            fwd = lambda p, b: fused_dae_apply(
                p, b, (2, 1, 2, 2), hidden, solver="rk4",
                precision=precision,
            )
        else:
            fwd = lambda p, b: model.apply(p, *[b[k] for k in keys])

        def step(params, opt_state, b, fwd=fwd):
            def loss_of(p):
                return dae_no_encode_loss(fwd(p, b), b)

            (loss, _), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        rec = {"path": "fused_pallas" if fused else "xla_scan"}
        if pol == "fused_bf16":
            rec["kernel_compute"] = "bfloat16"
        try:
            t0 = time.perf_counter()
            compiled = jax.jit(step, donate_argnums=(0, 1)).lower(
                params, opt_state, batch
            ).compile()
            rec["compile_s"] = round(time.perf_counter() - t0, 2)
            mem = compiled.memory_analysis()
            if mem is not None:
                rec["temp_bytes"] = int(getattr(mem, "temp_size_in_bytes", 0))
                rec["argument_bytes"] = int(
                    getattr(mem, "argument_size_in_bytes", 0)
                )
                rec["output_bytes"] = int(
                    getattr(mem, "output_size_in_bytes", 0)
                )
                rec["peak_bytes"] = rec["temp_bytes"] + rec["argument_bytes"]
        except Exception as e:  # OOM / RESOURCE_EXHAUSTED at compile
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            results["policies"][pol] = rec
            print(json.dumps({pol: rec}), flush=True)
            continue

        try:
            p, o = params, opt_state
            # warmup + timed chain; end on a value fetch (axon timing rule)
            p, o, loss = compiled(p, o, batch)
            _ = float(loss)
            t0 = time.perf_counter()
            for _i in range(n_steps):
                p, o, loss = compiled(p, o, batch)
            _ = float(loss)
            dt = (time.perf_counter() - t0) / n_steps
            rec["step_s"] = round(dt, 4)
            rec["traj_steps_per_s"] = round(B * (T - 1) / dt)
            rec["loss_finite"] = bool(np.isfinite(float(loss)))
        except Exception as e:  # runtime OOM
            rec["run_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        results["policies"][pol] = rec
        print(json.dumps({pol: rec}), flush=True)

    dst = pathlib.Path("benchmarks/adjoint_bench.json")
    if dst.exists():  # merge: partial re-runs extend the policy matrix
        prior = json.loads(dst.read_text())
        if prior.get("config", {}).get("T") == T:
            results["policies"] = {
                **prior.get("policies", {}), **results["policies"]
            }
    dst.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 4001
    pols = ("true", "sqrt", "adjoint")
    for a in sys.argv[2:]:
        if a.startswith("--policies"):
            pols = tuple(a.split("=", 1)[1].split(","))
    run(T=T, policies=pols)
