"""Convergence-recipe sweep for dae_channelwise at the reference envelope.

Round-4 finding (ACCURACY.md): at the reference's own hyperparameters
(Euler — ref script1:75 — lr 5e-3, no pre-update clip) NO recipe fully
converges: plain BPTT NaNs at eval epoch 105 (best 1.589), robust-guard
BPTT NaNs at 33 and freezes, multishoot survives but the stitched eval
never settles. The framework has levers the reference lacks — this sweep
tries them at the FULL envelope protocol (3200x1001, batch 64, h 128,
torch init, seed 0, StepLR sized for 400 epochs) truncated to
``STOP_AFTER`` epochs via TrainConfig.stop_after, which keeps the 400-epoch
lr schedule so short runs predict the full protocol. STOP_AFTER=150 covers
the known epoch-105 plain-BPTT divergence point with margin.

Winner criterion: lowest finite eval x-loss at the truncation with NO
nonfinite evals anywhere in the run; ties break toward the lower best-so-far.
The winner then runs the full 400 epochs via full_envelope_run machinery.

Usage (chip, sequential, wedge rules apply):
  python benchmarks/cw_envelope_sweep.py run <tag>   # one config
  python benchmarks/cw_envelope_sweep.py runall      # every missing config
  python benchmarks/cw_envelope_sweep.py summarize   # -> cw_sweep_summary.json
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

from benchmarks.full_envelope_run import DATA_DAE, write_data  # noqa: E402

STOP_AFTER = 150
OUT = pathlib.Path("saved_models/envelope_sweep")

# sweep grid (round-4 verdict #1): drop the Euler pin (rk4 trains this
# family fine at suite scale, BENCH_DETAILS 10b), lower lr (the wide-h
# entries already train at 1e-3), opt-in pre-update per-tensor clip
# (optim.per_param_clip — the reference's own clip is a documented no-op),
# raised robust_limit (guard only blow-ups, keep real magnitudes).
CONFIGS = {
    "lr1e3": ["--lr", "0.001"],
    "clip1": ["--gradient_clip", "1.0"],
    "lr1e3_clip1": ["--lr", "0.001", "--gradient_clip", "1.0"],
    "rlim10": ["--robust_loss", "--robust_limit", "10"],
    "rk4": ["--solver", "rk4"],
}


def model_dir(tag: str) -> pathlib.Path:
    return OUT / f"dae_channelwise_{tag}"


def run(tag: str):
    from py_psnode_tpu.cli.common import main

    flags = CONFIGS[tag]
    argv = [
        "--training",
        "--train_data", str(DATA_DAE / "training.npz"),
        "--test_data", str(DATA_DAE / "testing.npz"),
        "--model", str(model_dir(tag)),
        "--num", "3200", "--batch", "64", "--hidden", "128",
        "--epoch", "400", "--stop_after", str(STOP_AFTER), "--step", "1001",
        "--init_style", "torch", "--seed", "0",
        "--channel_impl", "einsum",
    ]
    if "--solver" not in flags:
        argv += ["--solver", "euler"]
    main("dae_channelwise", argv=argv + flags)


def runall():
    import subprocess

    write_data()
    for tag in CONFIGS:
        mdir = model_dir(tag)
        if (mdir / "train_and_eval.npz").exists():
            print(f"skip {tag} (already ran)", flush=True)
            continue
        print(f"=== cw sweep {tag} -> {mdir}", flush=True)
        r = subprocess.run([sys.executable, __file__, "run", tag])
        if r.returncode != 0:
            print(f"!!! {tag} failed rc={r.returncode}", flush=True)
    summarize()


def summarize():
    import numpy as np

    out = {
        "protocol": {
            "n_train": 3200, "t_len": 1001, "batch": 64, "hidden": 128,
            "schedule_epochs": 400, "stop_after": STOP_AFTER,
            "init_style": "torch", "seed": 0, "data": "SMIB (seed 0)",
            "baseline": "reference recipe (euler, lr 5e-3, no clip): plain "
                        "NaN at eval epoch 105 (best 1.589), robust NaN at "
                        "33 — full_envelope_summary.json",
        },
        "runs": {},
    }
    for tag, flags in CONFIGS.items():
        f = model_dir(tag) / "train_and_eval.npz"
        if not f.exists():
            continue
        hist = np.load(f, allow_pickle=True)
        evals = np.asarray(
            [[float(np.asarray(e[c], np.float64)) for c in (0, 1)]
             for e in hist["eval"]]
        )
        fin = np.isfinite(evals[:, 0])
        rec = {
            "flags": flags,
            "epochs_run": len(evals) - 1,
            "final_eval_x": None if not fin[-1] else float(evals[-1, 0]),
            "eval_x_at_epoch": {
                str(ep): (None if not fin[ep] else float(evals[ep, 0]))
                for ep in (10, 30, 50, 100, 150) if ep < len(evals)
            },
            "any_nonfinite_eval": bool(~fin.any() or (~fin).any()),
        }
        if (~fin).any():
            rec["first_nan_eval_epoch"] = int(np.argmax(~fin))
        if fin.any():
            best = int(np.nanargmin(np.where(fin, evals[:, 0], np.nan)))
            rec["best_eval_x"] = float(evals[best, 0])
            rec["best_eval_epoch"] = best
        out["runs"][tag] = rec
    dst = pathlib.Path("benchmarks/cw_sweep_summary.json")
    dst.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "summarize"
    if cmd == "run":
        run(sys.argv[2])
    elif cmd == "runall":
        runall()
    else:
        summarize()
