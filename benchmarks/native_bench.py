"""Serving-latency benchmark for the dependency-free C++ runtime.

The native runtime's role is PSOPS embedding (SURVEY §2.7: the reference
exports TorchScript for a C++ simulator): a host transient-stability
simulator steps the learned component model inside ITS integration loop, so
the number that matters is wall-clock per solver step per component
instance, CPU-only, no Python/JAX in the loop.

Runs the FULL native DAE rollout (learned init + lagged-i coupling +
algebraic net, ref my_solvers.py:82-131) at the reference envelope
(hidden 128, RK4, T=1001) for a single component instance (B=1, the
embedding scenario) and a plant fleet (B=64). Prints one JSON line per
config and appends a "native_runtime" section to BENCH_DETAILS.json.

Run: python benchmarks/native_bench.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from py_psnode_tpu.export.artifacts import flatten_params, write_weights_bin
    from py_psnode_tpu.export.native_runtime import (
        NativeModule, build_library, dae_rollout,
    )
    from py_psnode_tpu.models import DAEModel

    build_library()
    rng = np.random.default_rng(0)
    xd, zd, vd, idim, h, T = 2, 1, 2, 2, 128, 1001
    f32 = np.float32
    results = []
    import tempfile

    tmp = pathlib.Path(tempfile.mkdtemp())
    # init once at B=2 (model init only needs shapes)
    t_all = (np.cumsum(np.full((2, T, 1), 0.01, f32), axis=1) - 0.01).astype(f32)
    args = tuple(
        jnp.asarray(a)
        for a in (
            t_all,
            rng.normal(size=(2, T, xd)).astype(f32),
            rng.normal(size=(2, T, zd)).astype(f32),
            rng.normal(size=(2, T, vd)).astype(f32),
            rng.normal(size=(2, T, idim)).astype(f32),
        )
    )
    model = DAEModel(
        x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim, hidden_dim=h, solver="rk4"
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    p = params["params"]
    mods = {}
    for name in ("de_func", "ae_func", "init_func"):
        write_weights_bin(tmp / f"{name}.bin", flatten_params(p[name]))
        mods[name] = NativeModule(tmp / f"{name}.bin")

    for B, label, iters in ((1, "single component (PSOPS embedding)", 5),
                            (64, "component fleet", 3)):
        t = t_all[0, :, 0]
        z = rng.normal(size=(T, B, zd)).astype(f32)
        v = rng.normal(size=(T, B, vd)).astype(f32)
        i0 = rng.normal(size=(B, idim)).astype(f32)
        # warmup + timed
        dae_rollout(mods["de_func"], mods["ae_func"], mods["init_func"],
                    t, z, v, i0, solver="rk4")
        t0 = time.time()
        for _ in range(iters):
            dae_rollout(mods["de_func"], mods["ae_func"], mods["init_func"],
                        t, z, v, i0, solver="rk4")
        sec = (time.time() - t0) / iters
        r = {
            "name": f"native C++ DAE rollout, {label}",
            "batch": B, "t_len": T, "hidden": h, "solver": "rk4",
            "us_per_step_per_instance": round(sec / (T - 1) / B * 1e6, 2),
            "traj_steps_per_sec": round(B * (T - 1) / sec, 1),
            "host": "cpu x1",
        }
        results.append(r)
        print(json.dumps(r))

    # incremental stepper (closed-loop co-simulation contract): per-call
    # latency of one solver step through psnode_stepper_step, including the
    # ctypes boundary a Python host pays (a C++ host calls the symbol
    # directly and skips that overhead)
    from py_psnode_tpu.export.native_runtime import NativeStepper

    for B, label, iters in ((1, "single component (co-sim stepper)", 5),
                            (64, "component fleet (co-sim stepper)", 3)):
        z = rng.normal(size=(T, B, zd)).astype(f32)
        v = rng.normal(size=(T, B, vd)).astype(f32)
        i0 = rng.normal(size=(B, idim)).astype(f32)

        def run_stepper():
            st = NativeStepper(
                "dae", [mods["de_func"], mods["ae_func"], mods["init_func"]],
                batch=B, x_dim=xd, z_dim=zd, v_dim=vd, i_dim=idim,
                solver="rk4",
            )
            st.init(z0=z[0], v0=v[0], i0=i0)
            for j in range(1, T):
                st.step(0.01, z_prev=z[j - 1], v_prev=v[j - 1],
                        z_next=z[j], v_next=v[j])

        run_stepper()  # warmup
        t0 = time.time()
        for _ in range(iters):
            run_stepper()
        sec = (time.time() - t0) / iters
        r = {
            "name": f"native C++ DAE stepper, {label}",
            "batch": B, "t_len": T, "hidden": h, "solver": "rk4",
            "us_per_step_per_instance": round(sec / (T - 1) / B * 1e6, 2),
            "traj_steps_per_sec": round(B * (T - 1) / sec, 1),
            "host": "cpu x1 (incl. ctypes call overhead)",
        }
        results.append(r)
        print(json.dumps(r))

    out = pathlib.Path(__file__).resolve().parents[1] / "BENCH_DETAILS.json"
    if out.exists():
        d = json.loads(out.read_text())
        d["native_runtime"] = results
        out.write_text(json.dumps(d, indent=2))
        print(f"updated {out}")


if __name__ == "__main__":
    main()
