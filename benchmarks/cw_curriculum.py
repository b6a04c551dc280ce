"""Horizon-curriculum recipe for dae_channelwise at the reference envelope.

The round-5 sweep (cw_sweep_summary.json) shows every single-stage BPTT
recipe either NaNs (reference defaults) or survives but PLATEAUS at
x ~1.59 — entirely in x dim 0 (rotor angle): per-dim eval logs show
dim 1 at 2e-4 while dim 0 never improves past the variance level. The
rollout never learns the long-horizon swing.

This recipe attacks error accumulation directly with a capability the
reference lacks: train the SAME params at progressively longer horizons
(T=251 -> 501 -> 1001), warm-starting each stage from the previous stage's
best-eval checkpoint (resolve_checkpoint). Short-horizon BPTT learns the
local dynamics cheaply and stably; each longer stage only has to correct
accumulation, not learn from scratch. Final score = full-horizon (T=1001)
eval of the last stage — directly comparable to full_envelope_summary
entries.

Usage (chip, sequential):
  python benchmarks/cw_curriculum.py run          # all stages + final eval
  python benchmarks/cw_curriculum.py summarize    # -> cw_curriculum.json
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from benchmarks.full_envelope_run import DATA_DAE, write_data  # noqa: E402

OUT = pathlib.Path("saved_models/envelope_sweep")

# (tag, T, epochs, lr) — each stage keeps the full-envelope protocol
# otherwise (3200 samples, batch 64, h 128, torch init, seed 0, einsum,
# euler). Stage lr follows the plateau evidence: 5e-3 diverges unclipped at
# T=1001 but is fine short; the long stage runs the sweep's stable lr.
STAGES = [
    ("cur1_T251", 251, 100, 5e-3),
    ("cur2_T501", 501, 100, 2e-3),
    ("cur3_T1001", 1001, 200, 1e-3),
]


def stage_dir(tag: str) -> pathlib.Path:
    return OUT / f"dae_channelwise_{tag}"


def run():
    write_data()
    prev_best = None
    for tag, T, epochs, lr in STAGES:
        mdir = stage_dir(tag)
        if (mdir / "train_and_eval.npz").exists():
            print(f"skip {tag} (already ran)", flush=True)
        else:
            argv = [
                sys.executable, "-u", "-c",
                "import sys; sys.path.insert(0, '/root/repo'); "
                "from py_psnode_tpu.cli.common import main; "
                f"main('dae_channelwise', argv={_argv(tag, T, epochs, lr, prev_best)!r})",
            ]
            print(f"=== curriculum stage {tag} (T={T}, {epochs} ep, lr={lr})",
                  flush=True)
            r = subprocess.run(argv)
            if r.returncode != 0:
                print(f"!!! {tag} failed rc={r.returncode}", flush=True)
                sys.exit(1)  # nonzero so a retrying chain re-enters here
        from py_psnode_tpu.train.checkpoints import best_checkpoint

        best = best_checkpoint(stage_dir(tag))
        if best is None:
            print(f"!!! {tag} produced no finite-eval checkpoint", flush=True)
            sys.exit(1)
        print(f"{tag}: best eval x at epoch {best[0]}: {best[2]:.6g}",
              flush=True)
        prev_best = str(best[1])
    summarize()


def _argv(tag, T, epochs, lr, prev_best):
    argv = [
        "--training",
        "--train_data", str(DATA_DAE / "training.npz"),
        "--test_data", str(DATA_DAE / "testing.npz"),
        "--model", str(stage_dir(tag)),
        "--num", "3200", "--batch", "64", "--hidden", "128",
        "--epoch", str(epochs), "--step", str(T),
        "--solver", "euler", "--init_style", "torch", "--seed", "0",
        "--channel_impl", "einsum", "--lr", str(lr),
    ]
    if prev_best:
        argv += ["--warm_start", prev_best]  # params-only stage handoff
    return argv


def summarize():
    import numpy as np

    out = {"stages": {}}
    for tag, T, epochs, lr in STAGES:
        f = stage_dir(tag) / "train_and_eval.npz"
        if not f.exists():
            continue
        hist = np.load(f, allow_pickle=True)
        evals = np.asarray(
            [float(np.asarray(e[0], np.float64)) for e in hist["eval"]]
        )
        fin = np.isfinite(evals)
        rec = {
            "T": T, "epochs": epochs, "lr": lr,
            "final_eval_x": float(evals[-1]) if fin[-1] else None,
            "any_nonfinite_eval": bool((~fin).any()),
            # stage evals run at the stage horizon (cut_length truncates
            # the test set too) — only the T=1001 stage is comparable to
            # full_envelope_summary.json numbers
            "comparable_to_envelope": T == 1001,
        }
        if fin.any():
            b = int(np.nanargmin(np.where(fin, evals, np.nan)))
            rec["best_eval_x"], rec["best_eval_epoch"] = float(evals[b]), b
        out["stages"][tag] = rec
    pathlib.Path("benchmarks/cw_curriculum.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "summarize"
    run() if cmd == "run" else summarize()
