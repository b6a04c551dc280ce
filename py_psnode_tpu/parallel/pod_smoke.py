"""Multi-process (DCN) pod dry run — REAL ``jax.distributed`` transport.

The reference is single-process (SURVEY.md §2.6); this driver validates OUR
multi-host story end to end: every process initializes ``jax.distributed``,
builds the global ``(dcn, data)`` mesh (:func:`make_pod_mesh`), assembles its
host-local batch shard into the global batch
(:func:`host_batch_to_global`), and runs ONE jitted DAE training step whose
gradient all-reduce crosses the process boundary (ICI within a slice, DCN
across). The step is deterministic, so every process must print the same
loss — and that loss must equal the single-process simulated pod mesh
(``make_pod_mesh(dcn_size=N)``), proving the simulated and real layouts
compute identically.

On a real v5e pod (one process per host):

    python -m py_psnode_tpu.parallel.pod_smoke \
        --coordinator <host0>:12355 --num_processes N --process_id $i

On one machine (CI / this repo's tests): ``--self_test`` spawns
``num_processes`` local child processes over virtual CPU devices and checks
their losses agree with each other and with the simulated mesh.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

_CHILD_ENV = "_PSNODE_POD_SMOKE_CHILD"
# deterministic smoke shapes: global batch = 2 rows/device on a 2x4 mesh
GLOBAL_BATCH = 16
T_LEN = 17
HIDDEN = 16


def _smoke_batch():
    """Deterministic global batch (same on every process)."""
    rng = np.random.default_rng(0)
    B, T = GLOBAL_BATCH, T_LEN
    f32 = np.float32
    t = (np.cumsum(np.full((B, T, 1), 0.01), axis=1) - 0.01).astype(f32)
    batch = {
        "t": t,
        "x": rng.normal(size=(B, T, 2)).astype(f32),
        "z": rng.normal(size=(B, T, 1)).astype(f32),
        "v": rng.normal(size=(B, T, 2)).astype(f32),
        "i": rng.normal(size=(B, T, 2)).astype(f32),
        "event_t": np.full((B, 2), -1.0, f32),
        "z_jump": rng.normal(size=(B, 2, 1)).astype(f32),
        "v_jump": rng.normal(size=(B, 2, 2)).astype(f32),
        "mask": np.ones((B, T, 1), f32),
    }
    batch["event_t"][:, 0] = t[0, T // 3, 0]
    return batch


def pod_train_step_loss(mesh) -> float:
    """One jitted, sharded DAE train step on the given pod mesh; returns the
    (deterministic) loss. Params/opt replicated, batch sharded over BOTH mesh
    axes; under ``jax.distributed`` each process feeds only its host-local
    rows and the gradient all-reduce rides DCN across processes."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from py_psnode_tpu.models import DAEModel
    from py_psnode_tpu.parallel.distributed import host_batch_to_global
    from py_psnode_tpu.train.losses import dae_no_encode_loss
    from py_psnode_tpu.train.optim import make_optimizer

    batch = _smoke_batch()
    keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
    model = DAEModel(
        x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=HIDDEN, solver="rk4"
    )
    params = model.init(
        jax.random.PRNGKey(0), *(jnp.asarray(batch[k]) for k in keys)
    )
    tx = make_optimizer(5e-3, epochs=1, steps_per_epoch=1)
    opt_state = tx.init(params)

    spec = P(tuple(mesh.axis_names))
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, spec)

    def step(params, opt_state, b):
        def loss_of(p):
            out = model.apply(p, *[b[k] for k in keys])
            return dae_no_encode_loss(out, b)

        (loss, _), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    jstep = jax.jit(
        step, in_shardings=(rep, rep, bsh), out_shardings=(rep, rep, rep)
    )
    n_proc = jax.process_count()
    pid = jax.process_index()
    if n_proc > 1:
        # host-local rows only — device order in make_pod_mesh puts process
        # p's devices in dcn row p, so each host owns a contiguous row block
        lo, hi = pid * GLOBAL_BATCH // n_proc, (pid + 1) * GLOBAL_BATCH // n_proc
        gbatch = host_batch_to_global(
            mesh, {k: v[lo:hi] for k, v in batch.items()}, spec
        )
    else:
        gbatch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    new_params, _, loss = jstep(params, opt_state, gbatch)
    jax.block_until_ready(new_params)
    return float(loss)


def run_process(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax

    from py_psnode_tpu.parallel.distributed import initialize, make_pod_mesh

    initialize(coordinator, num_processes, process_id)
    mesh = make_pod_mesh()
    loss = pod_train_step_loss(mesh)
    print(
        f"pod_smoke proc {process_id}/{num_processes}: mesh="
        f"{dict(zip(mesh.axis_names, mesh.devices.shape))} "
        f"devices={jax.device_count()} loss={loss:.9f}",
        flush=True,
    )


def simulated_reference_loss(dcn_size: int) -> float:
    """Single-process reference on the simulated ``(dcn, data)`` mesh over
    this process's (virtual) devices."""
    from py_psnode_tpu.parallel.distributed import make_pod_mesh

    mesh = make_pod_mesh(dcn_size=dcn_size)
    return pod_train_step_loss(mesh)


def self_test(num_processes: int = 2, devices_per_process: int = 4) -> None:
    """Spawn real child processes on this machine (virtual CPU devices) and
    assert every process's loss matches the single-process simulated mesh."""
    import socket
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={devices_per_process}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the real chip
    env[_CHILD_ENV] = "1"
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = os.pathsep.join(p for p in (repo, env.get("PYTHONPATH", "")) if p)

    def spawn_round(port):
        procs = [
            subprocess.Popen(
                [
                    sys.executable, "-m", "py_psnode_tpu.parallel.pod_smoke",
                    "--coordinator", f"localhost:{port}",
                    "--num_processes", str(num_processes),
                    "--process_id", str(i),
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(num_processes)
        ]
        return procs, [p.communicate(timeout=600) for p in procs]

    # Probing a free port by bind-and-close is racy (it can be reclaimed
    # before the coordinator binds it), so retry the whole round on a FRESH
    # port when the failure is a coordinator-bind error.
    for attempt in range(3):
        with socket.socket() as s:  # candidate free port for the coordinator
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs, outs = spawn_round(port)
        bind_race = any(
            p.returncode != 0 and "address" in err.lower() and (
                "in use" in err.lower() or "bind" in err.lower()
            )
            for p, (_, err) in zip(procs, outs)
        )
        if not bind_race:
            break
        print(f"pod_smoke: coordinator port {port} raced, retrying "
              f"({attempt + 1}/3)", flush=True)
    losses = []
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"pod_smoke child {i} failed (rc={p.returncode}):\n{err[-3000:]}"
            )
        line = [l for l in out.splitlines() if "pod_smoke proc" in l][-1]
        print(line)
        losses.append(float(line.rsplit("loss=", 1)[1]))
    assert all(abs(l - losses[0]) < 1e-6 for l in losses), losses

    # single-process simulated-mesh reference, in a subprocess with ALL the
    # virtual devices (the caller may be pinned to a 1-chip backend)
    ref_env = dict(env)
    flags = [
        f for f in ref_env["XLA_FLAGS"].split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(
        "--xla_force_host_platform_device_count="
        f"{num_processes * devices_per_process}"
    )
    ref_env["XLA_FLAGS"] = " ".join(flags)
    ref_out = subprocess.run(
        [
            sys.executable, "-m", "py_psnode_tpu.parallel.pod_smoke",
            "--simulated_ref", "--num_processes", str(num_processes),
        ],
        env=ref_env, capture_output=True, text=True, timeout=600,
    )
    if ref_out.returncode != 0:
        raise RuntimeError(
            f"simulated-ref child failed:\n{ref_out.stderr[-3000:]}"
        )
    line = [l for l in ref_out.stdout.splitlines() if "loss=" in l][-1]
    print(line)
    ref = float(line.rsplit("loss=", 1)[1])
    assert abs(ref - losses[0]) < 1e-5, (ref, losses)
    print(
        f"pod_smoke self-test OK: {num_processes} processes x "
        f"{devices_per_process} devices, real-DCN loss == simulated-mesh loss"
    )


# --------------------------------------------------------------------------
# Full-Trainer pod run: the PRODUCTION training loop over the (dcn, data)
# mesh — 2 epochs with an orbax auto-resume in the middle, driven both as a
# real 2-process jax.distributed job and as the single-process simulated
# mesh, which must agree (the round-3 gap: the pod mesh existed but the
# Trainer never built it).

TRAINER_T = 33  # horizon for the pod trainer runs ((T-1) scan steps)


def _trainer_cfg(workdir: str, epochs: int, dcn_size=None):
    from py_psnode_tpu.train import TrainConfig

    return TrainConfig(
        variant="dae_no_encode",
        train_data=f"{workdir}/data/training.npz",
        test_data=f"{workdir}/data/testing.npz",
        model=f"{workdir}/m",
        num=16, batch=8, hidden=16, epoch=epochs, step=TRAINER_T,
        solver="rk4", larger_than=None, loss_record_iter=2,
        checkpointer="orbax", auto_resume=True, echo_logs=False,
        dcn_size=dcn_size, seed=0,
    )


def trainer_pod_run(workdir: str, dcn_size=None) -> str:
    """Train 1 epoch, then a fresh Trainer auto-resumes (orbax opt_state
    restored) and trains epoch 2 — the crash-recovery path over the pod
    mesh. Returns this process's final eval summary line."""
    import pathlib

    import jax

    from py_psnode_tpu.train import Trainer

    _, mdir = Trainer(_trainer_cfg(workdir, 1, dcn_size)).train()
    assert (pathlib.Path(mdir) / "model_checkpoint.1").exists()
    Trainer(_trainer_cfg(workdir, 2, dcn_size)).train()
    pid = jax.process_index()
    sfx = "" if pid == 0 else f".proc{pid}"
    mdir = pathlib.Path(mdir)
    tlog = (mdir / f"training{sfx}.log").read_text()
    assert "auto-resume from model_checkpoint.1 (orbax" in tlog, tlog[-500:]
    # every process logs the eval it computed (replicated global reads);
    # the final x_loss_total line is the epoch-2 eval
    eval_lines = [
        l for l in (mdir / f"testing{sfx}.log").read_text().splitlines()
        if "x_loss_total" in l
    ]
    # DAE eval lines read "...: x_loss_total: X, i_loss_total: Y." — pull
    # the x_loss FIELD, not the last colon field (which would be the i_loss)
    m = re.search(r"x_loss_total:\s*([-+0-9.eE]+)", eval_lines[-1])
    x_loss = float(m.group(1).rstrip("."))
    return (
        f"trainer_pod proc {pid}/{jax.process_count()}: "
        f"devices={jax.device_count()} final_eval_x_loss={x_loss:.9f}"
    )


def trainer_self_test(num_processes: int = 2, devices_per_process: int = 4):
    """2-process x 4-device REAL-DCN Trainer run (orbax auto-resume in the
    middle) must match the single-process simulated (dcn, data) mesh."""
    import socket
    import subprocess
    import tempfile

    from py_psnode_tpu.data.synthetic import write_smib_dataset

    work = tempfile.mkdtemp(prefix="psnode_pod_trainer_")
    write_smib_dataset(
        f"{work}/pod/data", n_train=16, n_test=8, n_steps=TRAINER_T, seed=0
    )
    write_smib_dataset(
        f"{work}/sim/data", n_train=16, n_test=8, n_steps=TRAINER_T, seed=0
    )

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={devices_per_process}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the real chip
    env[_CHILD_ENV] = "1"
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo, env.get("PYTHONPATH", "")) if p
    )

    def spawn_round(port):
        procs = [
            subprocess.Popen(
                [
                    sys.executable, "-m", "py_psnode_tpu.parallel.pod_smoke",
                    "--trainer_child", "--workdir", f"{work}/pod",
                    "--coordinator", f"localhost:{port}",
                    "--num_processes", str(num_processes),
                    "--process_id", str(i),
                ],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(num_processes)
        ]
        return procs, [p.communicate(timeout=900) for p in procs]

    for attempt in range(3):  # same coordinator-port race dance as self_test
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs, outs = spawn_round(port)
        bind_race = any(
            p.returncode != 0 and "address" in err.lower() and (
                "in use" in err.lower() or "bind" in err.lower()
            )
            for p, (_, err) in zip(procs, outs)
        )
        if not bind_race:
            break
        print(f"trainer pod: coordinator port {port} raced, retrying "
              f"({attempt + 1}/3)", flush=True)
    losses = []
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"trainer pod child {i} failed (rc={p.returncode}):\n"
                f"{err[-4000:]}"
            )
        line = [l for l in out.splitlines() if "trainer_pod proc" in l][-1]
        print(line)
        losses.append(float(line.rsplit("final_eval_x_loss=", 1)[1]))
    assert all(abs(l - losses[0]) < 1e-9 for l in losses), losses

    # single-process simulated (dcn, data) mesh over ALL the virtual devices
    sim_env = dict(env)
    flags = [
        f for f in sim_env["XLA_FLAGS"].split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(
        "--xla_force_host_platform_device_count="
        f"{num_processes * devices_per_process}"
    )
    sim_env["XLA_FLAGS"] = " ".join(flags)
    sim = subprocess.run(
        [
            sys.executable, "-m", "py_psnode_tpu.parallel.pod_smoke",
            "--trainer_sim", "--workdir", f"{work}/sim",
            "--num_processes", str(num_processes),
        ],
        env=sim_env, capture_output=True, text=True, timeout=900,
    )
    if sim.returncode != 0:
        raise RuntimeError(
            f"trainer simulated-mesh child failed:\n{sim.stderr[-4000:]}"
        )
    line = [l for l in sim.stdout.splitlines() if "trainer_pod proc" in l][-1]
    print(line)
    ref = float(line.rsplit("final_eval_x_loss=", 1)[1])
    assert abs(ref - losses[0]) < 1e-4, (ref, losses)
    print(
        f"trainer pod self-test OK: {num_processes}-process Trainer "
        "(orbax auto-resume) == single-process simulated pod mesh "
        f"({ref:.9f} vs {losses[0]:.9f})"
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default="localhost:12355")
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--process_id", type=int, default=0)
    ap.add_argument("--self_test", action="store_true")
    ap.add_argument("--simulated_ref", action="store_true")
    ap.add_argument("--trainer_self_test", action="store_true")
    ap.add_argument("--trainer_child", action="store_true")
    ap.add_argument("--trainer_sim", action="store_true")
    ap.add_argument("--workdir", default="")
    args = ap.parse_args(argv)
    if args.self_test:
        self_test(args.num_processes)
    elif args.simulated_ref:
        loss = simulated_reference_loss(dcn_size=args.num_processes)
        print(f"pod_smoke simulated-mesh reference loss={loss:.9f}", flush=True)
    elif args.trainer_self_test:
        trainer_self_test(args.num_processes)
    elif args.trainer_child:
        from py_psnode_tpu.parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)
        print(trainer_pod_run(args.workdir), flush=True)
    elif args.trainer_sim:
        print(
            trainer_pod_run(args.workdir, dcn_size=args.num_processes),
            flush=True,
        )
    else:
        run_process(args.coordinator, args.num_processes, args.process_id)


if __name__ == "__main__":
    main()
