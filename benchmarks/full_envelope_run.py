"""Run the reference's FULL published training envelope on one chip, for
EVERY variant, and summarize the guard configurations (ACCURACY.md "the FULL
reference envelope on one chip").

Protocol (ref neural_00_ODE_01_no_encode.py:239-253): 3200 train / 320 test
samples, T=1001, batch 64, hidden 128, 400 epochs, Adam 5e-3 + StepLR, RK4,
torch init, seed 0. ODE variants train on AVR regulator data, DAE variants
on SMIB generator data (the two synthetic families standing in for the
reference's PSOPS exports). The four main variants ride the fused kernels;
the channel-wise pair rides XLA with channel_impl=einsum (its fast form per
suite entries 10a-10f) and the reference's published Euler solver.

Each fused run is ~7.5 min wall on the v5e chip once compiles are cached;
the channel-wise runs are substantially longer (XLA scan forward).

Usage:
  python benchmarks/full_envelope_run.py data                 # write datasets
  python benchmarks/full_envelope_run.py run <variant> <tag>  # one config
  python benchmarks/full_envelope_run.py runall               # every missing config, sequentially
  python benchmarks/full_envelope_run.py summarize            # -> full_envelope_summary.json

Run chip configs SEQUENTIALLY (never two chip processes at once) and never
kill one mid-compile (CLAUDE.md wedge note).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

DATA_DAE = pathlib.Path("results/full_envelope")
DATA_ODE = pathlib.Path("results/full_envelope_ode")
DATA_MOTOR = pathlib.Path("results/full_envelope_motor")
DATA_COMPOSITE = pathlib.Path("results/full_envelope_composite")

# guard tags: plain = unguarded BPTT; robust = --robust_loss BPTT;
# ms = robust multishoot K=20 (kept for dae_no_encode, the round-3 study)
TAG_FLAGS = {
    "plain": [],
    "robust": ["--robust_loss"],
    "ms": ["--n_windows", "20", "--gap_weight", "0.3", "--robust_loss"],
}

VARIANTS = (
    "ode_no_encode", "ode_encode", "dae_no_encode", "dae_encode",
    "ode_channelwise", "dae_channelwise",
    # round-5 (round-4 verdict #4): the remaining DATA families at the full
    # envelope — does "robust guard suffices for dae_no_encode" (measured
    # on SMIB) generalize to the load class? "variant@family" keys flow
    # through the dae_no_encode trainer on motor / composite ZIP+motor
    # data. These families use --larger_than none: the reference's π filter
    # is a rotor-angle threshold, meaningless for slip/current channels
    # (same choice as the committed motor head-to-heads).
    "dae_no_encode@motor", "dae_no_encode@composite",
)
# which tags each variant runs (dae_no_encode carries the round-3 ms study;
# dae_channelwise runs ms because BOTH BPTT modes diverge at the envelope —
# plain NaN at eval epoch 105, robust at 33 — making it the decision rule's
# third branch: multishoot required)
VARIANT_TAGS = {v: ("plain", "robust") for v in VARIANTS}
VARIANT_TAGS["dae_no_encode"] = ("plain", "ms", "robust")
VARIANT_TAGS["dae_channelwise"] = ("plain", "robust", "ms")


def split_family(variant: str):
    """'dae_no_encode@motor' -> ('dae_no_encode', 'motor')."""
    name, _, family = variant.partition("@")
    return name, family or None

# round-3 model-dir names kept for dae_no_encode so its committed summary
# stays reproducible from the same paths
_LEGACY_DIRS = {
    ("dae_no_encode", "plain"): "saved_models/full_envelope",
    ("dae_no_encode", "ms"): "saved_models/full_envelope_ms",
    ("dae_no_encode", "robust"): "saved_models/full_envelope_robust",
}


def model_dir(variant: str, tag: str) -> pathlib.Path:
    legacy = _LEGACY_DIRS.get((variant, tag))
    return pathlib.Path(
        legacy or f"saved_models/envelope/{variant.replace('@', '_')}_{tag}"
    )


def _variant_flags(variant: str):
    name, family = split_family(variant)
    if family:
        return ["--fused", "--larger_than", "none"]
    if "channelwise" in variant:
        # einsum is the family's fast form at B=64/h=128 (BENCH_DETAILS
        # 10a vs 10c and 10b vs 10d), and the envelope runs ride the
        # reference's PUBLISHED solver (Euler, hardcoded at ref
        # script1:75) — rk4 multiplies the dynamics-net cost 4x on the
        # family with no fused fast path, which buys nothing for a
        # convergence/divergence study.
        return ["--channel_impl", "einsum"]
    return ["--fused"]


def _variant_solver(variant: str) -> str:
    return "euler" if "channelwise" in variant else "rk4"


def write_data():
    from py_psnode_tpu.data.synthetic import (
        write_avr_dataset,
        write_composite_dataset,
        write_motor_dataset,
        write_smib_dataset,
    )

    out = []
    for d, writer in (
        (DATA_DAE, write_smib_dataset),
        (DATA_ODE, write_avr_dataset),
        (DATA_MOTOR, write_motor_dataset),
        (DATA_COMPOSITE, write_composite_dataset),
    ):
        if not (d / "training.npz").exists():
            out += list(writer(d, n_train=3200, n_test=320,
                               n_steps=1001, seed=0))
    return out


def _data_dir(variant: str) -> pathlib.Path:
    _, family = split_family(variant)
    if family:
        return {"motor": DATA_MOTOR, "composite": DATA_COMPOSITE}[family]
    return DATA_ODE if variant.startswith("ode") else DATA_DAE


def run(variant: str, tag: str):
    from py_psnode_tpu.cli.common import main

    data = _data_dir(variant)
    main(
        split_family(variant)[0],
        argv=[
            "--training",
            "--train_data", str(data / "training.npz"),
            "--test_data", str(data / "testing.npz"),
            "--model", str(model_dir(variant, tag)),
            "--num", "3200", "--batch", "64", "--hidden", "128",
            "--epoch", "400", "--step", "1001",
            "--solver", _variant_solver(variant), "--init_style", "torch",
            "--seed", "0", *_variant_flags(variant), *TAG_FLAGS[tag],
        ],
    )


def runall(only: str = ""):
    """Run every config whose train_and_eval.npz is missing, sequentially,
    quick fused variants first (the channel-wise pair is the long tail).
    ``only`` filters variants by substring (e.g. "channelwise")."""
    import subprocess

    write_data()
    ordered = [v for v in VARIANTS if "channelwise" not in v] + [
        v for v in VARIANTS if "channelwise" in v
    ]
    if only:
        ordered = [v for v in ordered if only in v]
    for variant in ordered:
        for tag in VARIANT_TAGS[variant]:
            mdir = model_dir(variant, tag)
            if (mdir / "train_and_eval.npz").exists():
                print(f"skip {variant}:{tag} (already ran)", flush=True)
                continue
            print(f"=== envelope run {variant}:{tag} -> {mdir}", flush=True)
            r = subprocess.run(
                [sys.executable, __file__, "run", variant, tag]
            )
            if r.returncode != 0:
                print(f"!!! {variant}:{tag} failed rc={r.returncode}",
                      flush=True)
    summarize()


def summarize():
    import numpy as np

    dst = pathlib.Path("benchmarks/full_envelope_summary.json")
    out = {"protocol": {
        "n_train": 3200, "n_test": 320, "t_len": 1001, "batch": 64,
        "hidden": 128, "epochs": 400, "lr": 5e-3,
        "solver": "rk4 (channel-wise pair: euler — the reference's "
                  "published solver, ref script1:75)",
        "init_style": "torch", "seed": 0,
        "data": "ODE variants: AVR regulator (write_avr_dataset, seed 0); "
                "DAE variants: SMIB generator (write_smib_dataset, seed 0); "
                "@motor/@composite keys: induction-motor / composite "
                "ZIP+motor load data through the dae_no_encode trainer "
                "(--larger_than none — the π rotor-angle filter is "
                "meaningless for slip/current channels)",
        "forward": "fused kernels for the four main variants; "
                   "channel_impl=einsum XLA for the channel-wise pair",
    }, "runs": {}}
    prior = {}
    if dst.exists():  # keep entries whose run dirs were cleaned from disk
        try:
            prior = json.loads(dst.read_text()).get("runs", {})
        except Exception:
            pass

    for variant in VARIANTS:
        for tag in VARIANT_TAGS[variant]:
            key = f"{variant}:{tag}"
            f = model_dir(variant, tag) / "train_and_eval.npz"
            if not f.exists():
                # Carried-over entries are tagged so a protocol change plus
                # a partial re-run can't silently mix old and new records
                # under identical-looking keys.
                if key in prior:
                    out["runs"][key] = dict(prior[key], from_prior=True)
                elif variant == "dae_no_encode" and tag in prior:
                    out["runs"][key] = dict(prior[tag], from_prior=True)
                continue
            hist = np.load(f, allow_pickle=True)
            # eval rows: ODE [x_loss_total, per-sample]; DAE adds i_loss at
            # [1]. Row 0 is the pre-training initial eval.
            is_dae = variant.startswith("dae")
            cols = (0, 1) if is_dae else (0,)
            evals = np.asarray(
                [[float(np.asarray(e[c], np.float64)) for c in cols]
                 for e in hist["eval"]]
            )
            rec = {
                "extra_flags": _variant_flags(variant) + TAG_FLAGS[tag],
                "final_eval": [
                    None if not np.isfinite(v) else float(v)
                    for v in evals[-1]
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
            fin = np.isfinite(evals[:, 0])
            if fin.any():  # best finite eval + where (early-stop evidence
                # for diverging/oscillating runs; rows index = eval epoch)
                best = int(np.nanargmin(np.where(fin, evals[:, 0], np.nan)))
                rec["best_eval_x"] = float(evals[best, 0])
                rec["best_eval_epoch"] = best
            out["runs"][key] = rec
    dst.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "summarize"
    if cmd == "data":
        write_data()
    elif cmd == "run":
        run(sys.argv[2], sys.argv[3])
    elif cmd == "runall":
        runall(sys.argv[2] if len(sys.argv) > 2 else "")
    else:
        summarize()
