"""Run the reference's FULL published training envelope on one chip and
summarize the three guard configurations (see ACCURACY.md "the FULL
reference envelope on one chip").

Protocol (ref neural_00_ODE_01_no_encode.py:239-253): 3200 train / 320 test
SMIB DAE samples, T=1001, batch 64, hidden 128, 400 epochs, Adam 5e-3 +
StepLR, RK4, fused kernels, torch init, seed 0. Each run is ~12 min wall on
the v5e chip (first compile cached).

Usage:
  python benchmarks/full_envelope_run.py data                # write the dataset
  python benchmarks/full_envelope_run.py run {plain,ms,robust}
  python benchmarks/full_envelope_run.py summarize           # -> full_envelope_summary.json

Run the three configs SEQUENTIALLY (never two chip processes at once) and
never kill one mid-compile (CLAUDE.md wedge note).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

DATA = pathlib.Path("results/full_envelope")
MODELS = {
    "plain": "saved_models/full_envelope",
    "ms": "saved_models/full_envelope_ms",
    "robust": "saved_models/full_envelope_robust",
}
EXTRA = {
    "plain": [],
    "ms": ["--n_windows", "20", "--gap_weight", "0.3", "--robust_loss"],
    "robust": ["--robust_loss"],
}


def write_data():
    from py_psnode_tpu.data.synthetic import write_smib_dataset

    return write_smib_dataset(DATA, n_train=3200, n_test=320,
                              n_steps=1001, seed=0)


def run(tag: str):
    from py_psnode_tpu.cli.common import main

    main(
        "dae_no_encode",
        argv=[
            "--training",
            "--train_data", str(DATA / "training.npz"),
            "--test_data", str(DATA / "testing.npz"),
            "--model", MODELS[tag],
            "--num", "3200", "--batch", "64", "--hidden", "128",
            "--epoch", "400", "--step", "1001",
            "--solver", "rk4", "--fused", "--init_style", "torch",
            "--seed", "0", *EXTRA[tag],
        ],
    )


def summarize():
    import numpy as np

    out = {"protocol": {
        "n_train": 3200, "n_test": 320, "t_len": 1001, "batch": 64,
        "hidden": 128, "epochs": 400, "lr": 5e-3, "solver": "rk4",
        "fused": True, "init_style": "torch", "seed": 0,
        "data": "SMIB DAE (write_smib_dataset, seed 0)",
    }, "runs": {}}
    for tag, mdir in MODELS.items():
        f = pathlib.Path(mdir) / "train_and_eval.npz"
        if not f.exists():
            continue
        hist = np.load(f, allow_pickle=True)
        # eval rows: [x_loss_total, i_loss_total, per-dim arrays...];
        # row 0 is the pre-training initial eval, row ep is epoch ep
        evals = np.asarray(
            [[float(e[0]), float(e[1])] for e in hist["eval"]]
        )
        rec = {
            "extra_flags": EXTRA[tag],
            "final_eval_x_i": [
                None if not np.isfinite(v) else float(v) for v in evals[-1]
            ],  # None = NaN (keeps the JSON standard-parseable)
            "eval_x_at_epoch": {
                str(ep): (None if not np.isfinite(evals[ep][0])
                          else float(evals[ep][0]))
                for ep in (10, 30, 50, 100, 200, 400)
                if ep < len(evals)
            },
            "diverged": bool(not np.isfinite(evals[-1]).all()),
        }
        if rec["diverged"]:
            rec["first_nan_eval_epoch"] = int(
                np.argmax(~np.isfinite(evals[:, 0]))
            )
        out["runs"][tag] = rec
    dst = pathlib.Path("benchmarks/full_envelope_summary.json")
    dst.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "summarize"
    if cmd == "data":
        write_data()
    elif cmd == "run":
        run(sys.argv[2])
    else:
        summarize()
