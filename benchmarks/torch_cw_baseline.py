"""Pinned PyTorch-CPU baseline for the CHANNEL-WISE family.

Reference architecture (neural_base.py:68-133): ``nn.ModuleList`` of
per-dimension nets (1->h encoders, h->h extractors, h->h output heads)
around a shared vertical net applied over the channel axis via a permute —
driven by a Python RK4 time loop, exactly like the reference would run it
(the reference's own ``ODE_Base`` is keyword-incompatible with its solver,
SURVEY.md §2.3; this is an original implementation of the repaired
semantics pinned in ``py_psnode_tpu.models.funcs.ChannelWiseDEFunc``, not
a copy).

The family costs ~2.4 GFLOP per solver step at the reference envelope
(B=64, h=128, xd=zd=2) — ~7 TFLOP per full T=1001 training step, which is
>20 min PER STEP on this 1-core host. Per-solver-step cost is
T-invariant (identical work each step; the Python-loop dispatch overhead
is also per step), so the pin measures trajectory-steps/sec at T=51 and
records that scope in the pin file.

Run directly to (re)measure:  python benchmarks/torch_cw_baseline.py
"""

from __future__ import annotations

import json
import pathlib
import time

PIN_FILE = pathlib.Path(__file__).parent / "baseline_pin_cw.json"

BATCH = 64
T_MEASURE = 51
HIDDEN = 128
X_DIM, Z_DIM = 2, 2


def build(torch):
    import torch.nn as nn

    h = HIDDEN
    C = X_DIM + Z_DIM

    def mlp(dims):
        layers = []
        for a, b in zip(dims[:-1], dims[1:]):
            layers += [nn.Linear(a, b), nn.ELU()]
        return nn.Sequential(*layers[:-1])

    per = lambda n, dims: nn.ModuleList([mlp(dims) for _ in range(n)])
    nets = dict(
        x_encoder=per(X_DIM, (1, h, h)),
        z_encoder=per(Z_DIM, (1, h, h)),
        xh_ext=per(X_DIM, (h, h, h)),
        zh_ext=per(Z_DIM, (h, h, h)),
        xh_dot_head=per(X_DIM, (h, h, h)),
        x_decoder=per(X_DIM, (h, h, 1)),
        xh_dot_v=mlp((3 * C, h, h, h, X_DIM)),
    )
    import torch.nn as nn2

    class CW(nn2.Module):
        def __init__(self):
            super().__init__()
            for k, v in nets.items():
                setattr(self, k, v)

    return CW()


def train_step_time(n_steps: int = 1, t_len: int = T_MEASURE, compile=False):
    """Seconds per training step (fwd + bwd + adam) of the channel-wise
    RK4 rollout with the reference's per-channel ModuleList loops and a
    Python time loop. ``compile=True`` sends the per-step body through
    ``torch.compile`` (a STRONGER baseline than the reference ever was)."""
    import torch

    torch.manual_seed(0)
    m = build(torch)
    opt = torch.optim.Adam(m.parameters(), lr=5e-3)
    B, h = BATCH, HIDDEN

    t = torch.linspace(0, 10, t_len).reshape(t_len, 1, 1).expand(t_len, B, 1)
    x = torch.randn(t_len, B, X_DIM)
    z = torch.randn(t_len, B, Z_DIM)

    stack = lambda nets, u: torch.stack(
        [net(u[..., c, :]) for c, net in enumerate(nets)], dim=-2
    )

    def z_features(zt):
        return stack(m.zh_ext, stack(m.z_encoder, zt[..., None]))

    def dyn(f_init, xh, fz):
        fx = stack(m.xh_ext, xh)
        ft = torch.cat([fx, fz], dim=-2)                 # [B, C, h]
        feat = torch.cat([ft, f_init, ft - f_init], dim=-2)
        dot = m.xh_dot_v(feat.transpose(-1, -2)).transpose(-1, -2)
        return stack(m.xh_dot_head, dot)                 # [B, xd, h]

    one_third = 1.0 / 3.0

    def rk4(x0, dt, fz, f_init):
        f = lambda xx: dyn(f_init, xx, fz)
        k1 = f(x0)
        k2 = f(x0 + dt * k1 * one_third)
        k3 = f(x0 + dt * (k2 - k1 * one_third))
        k4 = f(x0 + dt * (k1 - k2 + k3))
        return x0 + (k1 + 3.0 * (k2 + k3) + k4) * dt * 0.125

    if compile:
        rk4 = torch.compile(rk4, dynamic=False)

    def one_training_step():
        opt.zero_grad()
        xh0 = stack(m.x_encoder, x[0][..., None])
        f_init = torch.cat(
            [stack(m.xh_ext, xh0), z_features(z[0])], dim=-2
        )
        xh = xh0
        outs = [stack(m.x_decoder, xh)[..., 0]]
        for j in range(1, t_len):
            dt = (t[j] - t[j - 1])[..., None]
            xh = rk4(xh, dt, z_features(z[j - 1]), f_init)
            outs.append(stack(m.x_decoder, xh)[..., 0])
        loss = ((torch.stack(outs) - x) ** 2).mean()
        loss.backward()
        opt.step()

    one_training_step()  # warmup
    t0 = time.time()
    for _ in range(n_steps):
        one_training_step()
    return (time.time() - t0) / n_steps


def measure_and_pin(n_steps: int = 1):
    import torch

    sec = train_step_time(n_steps=n_steps)
    pin = {
        "config": {
            "batch": BATCH, "t_len_measured": T_MEASURE, "hidden": HIDDEN,
            "dims": [X_DIM, Z_DIM], "solver": "rk4_38",
            "kind": "channelwise_ode_train_step",
            "note": "per-solver-step cost is T-invariant; rate measured at "
                    "T=51 (a full T=1001 step is >20 min on this host)",
        },
        "sec_per_train_step": sec,
        "trajectory_steps_per_sec": BATCH * (T_MEASURE - 1) / sec,
        "hardware": f"cpu x{__import__('os').cpu_count()}",
        "framework": f"torch {torch.__version__} "
                     "(reference-style per-channel ModuleLists, Python time loop)",
    }
    try:
        sec_c = train_step_time(n_steps=n_steps, compile=True)
        pin["sec_per_train_step_compiled"] = sec_c
        pin["trajectory_steps_per_sec_compiled"] = BATCH * (T_MEASURE - 1) / sec_c
    except Exception as e:
        pin["compiled_error"] = f"{type(e).__name__}: {e}"
    PIN_FILE.write_text(json.dumps(pin, indent=2))
    return pin


def get_pin(allow_measure: bool = True):
    if PIN_FILE.exists():
        return json.loads(PIN_FILE.read_text())
    if not allow_measure:
        return None
    return measure_and_pin()


if __name__ == "__main__":
    print(json.dumps(measure_and_pin(), indent=2))
