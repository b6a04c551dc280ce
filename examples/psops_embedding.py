"""End-to-end PSOPS-embedding demo: train -> export -> native C++ rollout.

The reference's deployment story (README.md:6-16, neural_01_DAE_01_no_encode
.py:117-133) is: train a neural-DAE component model in Python, export its
sub-networks, and embed them in a C++ power-system simulator that drives the
time loop itself. This script walks that full path on a synthetic SMIB
(single-machine-infinite-bus) dataset:

  1. generate data            py_psnode_tpu.data.write_smib_dataset
  2. train DAE no-encode      py_psnode_tpu.train.Trainer (--training)
  3. export artifacts         Trainer.save()  (--saving: StableHLO + npz +
                              flat .bin per sub-network)
  4. native rollout           native/psnode_infer.cpp via the ctypes binding
                              (the ENTIRE rollout loop runs in C++ — learned
                              init, lagged-i differential steps, algebraic net)
  5. parity check             native trajectory vs the JAX model's
  6. closed-loop co-sim       NativeStepper: the host solves the network
                              equation from the surrogate's own injected
                              current each step and feeds the voltage back —
                              the true PSOPS coupling, impossible with a
                              whole-horizon rollout API

Events note: the native runtime deliberately takes no event schedule — in the
embedding scenario the surrounding simulator knows the post-event network
state and feeds the post-event z/v streams directly (same contract as the
framework's own precomputed jumped streams, solvers/events.py). The parity
check therefore runs on the no-event window.

Run:  python examples/psops_embedding.py [--cpu] [--workdir DIR]
(~2 min on CPU; --cpu forces the CPU backend on machines whose default
jax platform is a remote accelerator.)
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

# runnable straight from a checkout: python examples/psops_embedding.py
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU jax backend (set before jax init)")
    ap.add_argument("--workdir", default=None,
                    help="output directory (default: a fresh temp dir)")
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from py_psnode_tpu.data import DaeSamples, write_smib_dataset
    from py_psnode_tpu.train import TrainConfig, Trainer
    from py_psnode_tpu.train.trainer import dataset_dims
    from py_psnode_tpu.train.variants import get_variant

    if args.workdir:
        work = pathlib.Path(args.workdir)
        work.mkdir(parents=True, exist_ok=True)
    else:
        import tempfile

        work = pathlib.Path(tempfile.mkdtemp(prefix="psnode_demo_"))
    print(f"== workdir {work}")

    # -- 1. synthetic SMIB DAE data (stand-in for the PSOPS sample dumps,
    #       which are behind an unreachable link — reference README.md:38-42)
    train_f, test_f = write_smib_dataset(
        work / "data", n_train=32, n_test=8, n_steps=41, seed=0
    )
    print(f"== data {train_f.name}, {test_f.name}")

    # -- 2. train (the --training CLI mode drives exactly this object)
    cfg = TrainConfig(
        variant="dae_no_encode",
        train_data=str(train_f),
        test_data=str(test_f),
        model=str(work / "model"),
        num=32,
        batch=8,
        hidden=16,
        epoch=args.epochs,
        step=41,
        solver="rk4",
        larger_than=None,
        echo_logs=False,
    )
    t0 = time.time()
    params, model_path = Trainer(cfg).train()
    hist = np.load(model_path / "train_and_eval.npz", allow_pickle=True)
    ev = [float(np.asarray(e[0])) + float(np.asarray(e[1])) for e in hist["eval"]]
    print(f"== trained {args.epochs} epochs in {time.time() - t0:.1f}s; "
          f"eval x+i loss {ev[0]:.4f} -> {ev[-1]:.4f}")

    # -- 3. export (the --saving CLI mode, which points --model at a
    #       checkpoint): StableHLO + .npz + flat .bin per sub-network
    import dataclasses

    ckpt = model_path / f"model_checkpoint.{args.epochs}"
    saved = Trainer(dataclasses.replace(cfg, model=str(ckpt))).save()
    print(f"== exported {sorted(p.name for p in saved.iterdir())}")

    # -- 4. full native rollout in C++ (build the runtime on first use)
    from py_psnode_tpu.export.native_runtime import (
        NativeModule,
        build_library,
        dae_rollout,
    )

    build_library()
    de = NativeModule(saved / "de_func.weights.bin")
    ae = NativeModule(saved / "ae_func.weights.bin")
    init = NativeModule(saved / "init_func.weights.bin")

    ds = DaeSamples.load(test_f)
    B = 4
    t = np.asarray(ds.t[:B], np.float32)          # [B, T, 1]
    z = np.asarray(ds.z[:B], np.float32)
    v = np.asarray(ds.v[:B], np.float32)
    i = np.asarray(ds.i[:B], np.float32)
    tm = lambda a: np.swapaxes(a, 0, 1)           # -> time-major [T, B, d]

    t1 = time.time()
    x_nat, i_nat = dae_rollout(
        de, ae, init, t[0, :, 0], tm(z), tm(v), i[:, 0], solver="rk4"
    )
    native_s = time.time() - t1
    T = t.shape[1]
    print(f"== native rollout: B={B} T={T} in {native_s * 1e3:.1f} ms "
          f"({B * (T - 1) / native_s:.0f} traj-steps/s, single host thread)")

    # -- 5. parity vs the JAX model (no-event window: event_t = -1)
    v5 = get_variant("dae_no_encode")
    dims = dataset_dims(v5, ds)
    model = v5.make_model(dims, cfg.hidden, solver="rk4")
    batch = {
        "t": t, "x": np.asarray(ds.x[:B], np.float32), "z": z, "v": v, "i": i,
        "event_t": np.full((B, 2), -1.0, np.float32),
        "z_jump": np.zeros((B, 2, z.shape[-1]), np.float32),
        "v_jump": np.zeros((B, 2, v.shape[-1]), np.float32),
    }
    jargs = tuple(jnp.asarray(batch[k]) for k in v5.batch_args)
    x_ref, i_ref = model.apply(params, *jargs)
    dx = float(np.max(np.abs(tm(x_nat) - np.asarray(x_ref))))
    di = float(np.max(np.abs(tm(i_nat) - np.asarray(i_ref))))
    print(f"== parity: max|x_native - x_jax| = {dx:.2e}, "
          f"max|i_native - i_jax| = {di:.2e}")

    # -- 6. CLOSED-LOOP co-simulation with the incremental stepper: the host
    #       "network solver" computes the bus voltage from the surrogate's
    #       own injected current each step (v = Vinf + jXl*i, the SMIB
    #       network equation — jXl recovered per sample from the data) and
    #       feeds it back. This is the loosely-coupled partitioned scheme a
    #       real simulator runs; the rollout API above cannot do it because
    #       v there must be known for the whole horizon up front.
    from py_psnode_tpu.export.native_runtime import NativeStepper

    vC = v[:, :, 0] + 1j * v[:, :, 1]           # [B, T] complex bus voltage
    iC = i[:, :, 0] + 1j * i[:, :, 1]
    jxl = (vC[:, 0] - 1.0) / iC[:, 0]           # per-sample jXl (Vinf_pre=1)

    st = NativeStepper(
        "dae", [de, ae, init], batch=B, x_dim=x_nat.shape[-1],
        z_dim=z.shape[-1], v_dim=v.shape[-1], i_dim=i.shape[-1], solver="rk4",
    )
    x_cl = np.empty_like(x_nat)
    i_cl = np.empty_like(i_nat)
    x_cl[0], i_cl[0] = st.init(z0=z[:, 0], v0=v[:, 0], i0=i[:, 0])
    v_prev = v[:, 0]
    t2 = time.time()
    for j in range(1, T):
        # host network solve from the surrogate's latest current
        vc = 1.0 + jxl * (i_cl[j - 1, :, 0] + 1j * i_cl[j - 1, :, 1])
        v_next = np.stack([vc.real, vc.imag], axis=-1).astype(np.float32)
        x_cl[j], i_cl[j] = st.step(
            float(t[0, j, 0] - t[0, j - 1, 0]),
            z_prev=z[:, j - 1], v_prev=v_prev,
            z_next=z[:, j], v_next=v_next,
        )
        v_prev = v_next
    cosim_s = time.time() - t2
    # deviation vs the open-loop rollout is exactly the coupling feedback
    # effect (same surrogate, same solver)
    dev = float(np.sqrt(np.mean((x_cl - x_nat) ** 2)))
    print(f"== closed-loop co-sim: B={B} T={T} in {cosim_s * 1e3:.1f} ms; "
          f"x-RMS deviation from open-loop rollout {dev:.3e}")

    ok = dx < 5e-4 and di < 5e-4 and np.isfinite(x_cl).all() and dev < 1.0
    print("== PSOPS-embedding demo", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
