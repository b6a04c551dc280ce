"""Multi-shooting convergence study (VERDICT r2 item 3).

Throughput alone (BENCH_DETAILS 6a-6h) shows multishoot beats plain BPTT on
traj-steps/s; this study pairs it with ACCURACY: train the fused DAE
no-encode model on SMIB generator data at the reference horizon (T=1001)
with K ∈ {1 (plain BPTT), 8, 20, 40} windows and gap_weight ∈ {0.3, 1, 3},
and record the per-epoch TRUE-rollout eval loss (the trainer always
evaluates with the plain rollout, so histories are directly comparable).

Reference context: teacher forcing (my_solvers.py:74) and cut_length
(neural_base.py:22) are the reference's only long-horizon levers; multishoot
is the TPU-native third option — windows fold into the batch axis, turning
serial time into parallel MXU rows.

Writes benchmarks/multishoot_study.json; summarize into ACCURACY.md.
Run: python benchmarks/multishoot_study.py [--epochs N] [--quick]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_one(tag, data, workdir, *, n_windows, gap_weight, epochs, steps,
            n_train, hidden, batch):
    from py_psnode_tpu.train import TrainConfig, Trainer

    train_f, test_f = data
    cfg = TrainConfig(
        variant="dae_no_encode",
        train_data=str(train_f),
        test_data=str(test_f),
        model=str(workdir / tag),
        num=n_train,
        batch=batch,
        hidden=hidden,
        epoch=epochs,
        step=steps,
        solver="rk4",
        larger_than=None,
        fused=True,
        n_windows=n_windows,
        gap_weight=gap_weight,
        echo_logs=False,
    )
    t0 = time.time()
    params, model_path = Trainer(cfg).train()
    wall = time.time() - t0
    hist = np.load(model_path / "train_and_eval.npz", allow_pickle=True)
    evals = [
        float(np.asarray(e[0], np.float64)) + float(np.asarray(e[1], np.float64))
        for e in hist["eval"]
    ]
    return {"tag": tag, "n_windows": n_windows, "gap_weight": gap_weight,
            "eval_history": evals, "final": evals[-1], "wall_s": wall}


def epochs_to(evals, thresh):
    for e, v in enumerate(evals):
        if v <= thresh:
            return e  # eval index 0 = before training
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--steps", type=int, default=1001)
    ap.add_argument("--n_train", type=int, default=320)
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.epochs, args.steps, args.n_train = 3, 101, 32

    from py_psnode_tpu.cli.common import enable_compile_cache
    from py_psnode_tpu.data import write_smib_dataset

    enable_compile_cache()
    work = REPO / "benchmarks" / "ms_study_work"
    data = write_smib_dataset(work / "data", n_train=args.n_train,
                              n_test=args.n_test, n_steps=args.steps, seed=0)

    kw = dict(epochs=args.epochs, steps=args.steps, n_train=args.n_train,
              hidden=args.hidden, batch=args.batch)
    Ks = [None, 8, 20, 40] if not args.quick else [None, 4]
    runs = []
    for K in Ks:
        tag = f"K{K or 1}_g1"
        runs.append(run_one(tag, data, work, n_windows=K, gap_weight=1.0, **kw))
        print(json.dumps(runs[-1] | {"eval_history": "..."}), flush=True)
    if not args.quick:
        for K, gw in ((20, 0.3), (20, 3.0), (20, 0.1), (8, 0.3), (40, 0.3)):
            runs.append(run_one(f"K{K}_g{gw}", data, work, n_windows=K,
                                gap_weight=gw, **kw))
            print(json.dumps(runs[-1] | {"eval_history": "..."}), flush=True)

    # epochs-to-tolerance vs the plain-BPTT final loss
    base = runs[0]["final"]
    thresh = 1.1 * base
    for r in runs:
        r["epochs_to_1p1x_bptt_final"] = epochs_to(r["eval_history"], thresh)

    out = REPO / "benchmarks" / "multishoot_study.json"
    out.write_text(json.dumps(
        {"protocol": vars(args), "bptt_final": base, "runs": runs}, indent=2
    ))
    print(f"wrote {out}\n")
    print(f"{'run':12s} {'final':>10s} {'ep->1.1xBPTT':>12s} {'wall':>8s}")
    for r in runs:
        ep = r["epochs_to_1p1x_bptt_final"]
        print(f"{r['tag']:12s} {r['final']:10.5f} "
              f"{str(ep) if ep is not None else '-':>12s} {r['wall_s']:7.1f}s")


if __name__ == "__main__":
    main()
