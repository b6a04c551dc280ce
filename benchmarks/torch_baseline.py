"""Pinned PyTorch-CPU baseline for the reference algorithm.

The reference repo publishes no benchmark numbers (BASELINE.md), so the
baseline is measured here: an original PyTorch implementation of the pinned
stepping semantics (the same rules as tests/np_reference.py — written from
SURVEY.md, not copied), run on CPU at the reference training envelope
(batch 64 × T=1001 × hidden 128, RK4, DAE with algebraic net,
neural_00_ODE_01_no_encode.py:239-253). The measured trajectory-steps/sec is
cached in ``baseline_pin.json`` next to this file; ``bench.py`` compares the
TPU framework against that pin.

Run directly to (re)measure:  python benchmarks/torch_baseline.py
"""

from __future__ import annotations

import json
import pathlib
import time

PIN_FILE = pathlib.Path(__file__).parent / "baseline_pin.json"

# reference training envelope
BATCH = 64
T = 1001
HIDDEN = 128
X_DIM, Z_DIM, V_DIM, I_DIM = 2, 1, 2, 2


def build(torch):
    import torch.nn as nn

    h = HIDDEN
    d_in = X_DIM + Z_DIM + V_DIM + I_DIM

    de = nn.Sequential(
        nn.Linear(3 * d_in, h), nn.ELU(),
        nn.Linear(h, h), nn.ELU(),
        nn.Linear(h, h), nn.ELU(),
        nn.Linear(h, X_DIM),
    )
    ae = nn.Sequential(
        nn.Linear(d_in + (X_DIM + Z_DIM + V_DIM), h), nn.ELU(),
        nn.Linear(h, h), nn.ELU(),
        nn.Linear(h, h), nn.ELU(),
        nn.Linear(h, I_DIM),
    )
    init_f = nn.Sequential(
        nn.Linear(Z_DIM + V_DIM + I_DIM, h), nn.ELU(),
        nn.Linear(h, h), nn.ELU(),
        nn.Linear(h, X_DIM),
    )
    return de, ae, init_f


def train_step_time(
    n_steps: int = 2, t_len: int = T, batch: int = BATCH, compile: bool = False
):
    """Seconds per training step (fwd + bwd + adam) of the reference-style
    RK4 DAE solve with a Python time loop (the reference's architecture).

    ``compile=True`` measures a STRONGER baseline than the reference ever
    was: the per-step RK4+AE body goes through ``torch.compile`` (fused CPU
    kernels, no per-op dispatch), keeping only the time loop in Python —
    the best a torch-CPU implementation of this algorithm realistically
    gets without rewriting it."""
    import torch

    torch.manual_seed(0)
    de, ae, init_f = build(torch)
    params = list(de.parameters()) + list(ae.parameters()) + list(init_f.parameters())
    opt = torch.optim.Adam(params, lr=5e-3)

    B = batch
    t = torch.linspace(0, 10, t_len).reshape(t_len, 1, 1).expand(t_len, B, 1)
    x = torch.randn(t_len, B, X_DIM)
    z = torch.randn(t_len, B, Z_DIM)
    v = torch.randn(t_len, B, V_DIM)
    i = torch.randn(t_len, B, I_DIM)

    def de_fn(xt, zt, vt, it, init):
        u = torch.cat([xt, zt, vt, it], dim=-1)
        return de(torch.cat([init, u - init, u], dim=-1))

    def ae_fn(xt, zt, vt, init):
        return ae(torch.cat([init, xt, zt, vt], dim=-1))

    one_third, two_thirds = 1.0 / 3.0, 2.0 / 3.0

    def rk4(x0, dt, zt, vt, it, init):
        f = lambda xx: de_fn(xx, zt, vt, it, init)
        k1 = f(x0)
        k2 = f(x0 + dt * k1 * one_third)
        k3 = f(x0 + dt * (k2 - k1 * one_third))
        k4 = f(x0 + dt * (k1 - k2 + k3))
        return (k1 + 3.0 * (k2 + k3) + k4) * dt * 0.125

    def step_body(x0, i0, dt, z0, v0, z1, v1, init):
        x1 = x0 + rk4(x0, dt, z0, v0, i0, init)
        i1 = ae_fn(x1, z1, v1, init)
        return x1, i1

    if compile:
        step_body = torch.compile(step_body, dynamic=False)

    def one_training_step():
        opt.zero_grad()
        x0 = init_f(torch.cat([z[0], v[0], i[0]], dim=-1))
        init = torch.cat([x0, z[0], v[0], i[0]], dim=-1)
        i0 = ae_fn(x0, z[0], v[0], init)
        xs = torch.zeros(t_len, B, X_DIM)
        ys = torch.zeros(t_len, B, I_DIM)
        xs[0], ys[0] = x0, i0
        for j in range(1, t_len):
            dt = t[j] - t[j - 1]
            x1, i1 = step_body(x0, i0, dt, z[j - 1], v[j - 1], z[j], v[j], init)
            xs[j], ys[j] = x1, i1
            x0, i0 = x1, i1
        loss = ((xs - x) ** 2).mean() + ((ys - i) ** 2).mean()
        loss.backward()
        opt.step()

    one_training_step()  # warmup
    t0 = time.time()
    for _ in range(n_steps):
        one_training_step()
    return (time.time() - t0) / n_steps


def measure_and_pin(n_steps: int = 2):
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    sec = train_step_time(n_steps=n_steps)
    traj_steps_per_sec = BATCH * (T - 1) / sec
    pin = {
        "config": {
            "batch": BATCH, "t_len": T, "hidden": HIDDEN,
            "dims": [X_DIM, Z_DIM, V_DIM, I_DIM],
            "solver": "rk4_38", "kind": "dae_train_step",
        },
        "sec_per_train_step": sec,
        "trajectory_steps_per_sec": traj_steps_per_sec,
        "hardware": f"cpu x{__import__('os').cpu_count()}",
        "framework": f"torch {torch.__version__} (reference-style Python time loop)",
    }
    # stronger baseline: torch.compile'd step body (see train_step_time)
    try:
        sec_c = train_step_time(n_steps=n_steps, compile=True)
        pin["sec_per_train_step_compiled"] = sec_c
        pin["trajectory_steps_per_sec_compiled"] = BATCH * (T - 1) / sec_c
    except Exception as e:  # torch.compile unavailable/broken on this host
        pin["compiled_error"] = f"{type(e).__name__}: {e}"
    PIN_FILE.write_text(json.dumps(pin, indent=2))
    return pin


def get_pin(allow_measure: bool = True):
    if PIN_FILE.exists():
        pin = json.loads(PIN_FILE.read_text())
        if (
            allow_measure
            and "trajectory_steps_per_sec_compiled" not in pin
            and "compiled_error" not in pin
        ):  # backfill the stronger compiled baseline into an older pin
            try:
                sec_c = train_step_time(n_steps=2, compile=True)
                pin["sec_per_train_step_compiled"] = sec_c
                pin["trajectory_steps_per_sec_compiled"] = BATCH * (T - 1) / sec_c
            except Exception as e:
                pin["compiled_error"] = f"{type(e).__name__}: {e}"
            PIN_FILE.write_text(json.dumps(pin, indent=2))
        return pin
    if not allow_measure:
        return None
    return measure_and_pin()


if __name__ == "__main__":
    print(json.dumps(measure_and_pin(), indent=2))
