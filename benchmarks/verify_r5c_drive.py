"""Round-5 verify drive (warm_start + fwd/bwd cap knobs) on the real TPU.

Leg A: CLI --warm_start — donor run, then a warm-started run into its own
dir; asserts the artifacts, the absence of the _branch dir, and that the
warm-started pre-training eval matches the donor's best eval (params
actually inherited).
Leg B: the new fwd_cap/bwd_cap knobs on a real fused train step at a
B > cap shape (caps bind) — loss finite and falling over a few iters.

Run: python -u benchmarks/verify_r5c_drive.py > /tmp/verify_r5c.log 2>&1
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def leg_a():
    import numpy as np

    from py_psnode_tpu.cli.common import main
    from py_psnode_tpu.data.synthetic import write_avr_dataset

    d = pathlib.Path(tempfile.mkdtemp(prefix="verify_r5c_"))
    train_f, test_f = write_avr_dataset(d, n_train=16, n_test=8, n_steps=51)
    base = [
        "--train_data", str(train_f), "--test_data", str(test_f),
        "--num", "16", "--batch", "8", "--hidden", "16", "--step", "51",
    ]
    donor = d / "donor"
    main("ode_no_encode", argv=["--training", "--model", str(donor),
                                "--epoch", "2"] + base)
    warm = d / "warm"
    main("ode_no_encode", argv=["--training", "--model", str(warm),
                                "--epoch", "1", "--warm_start", str(donor)]
         + base)
    assert (warm / "train_and_eval.npz").exists(), "warm run artifacts"
    assert not (d / "warm_branch").exists(), "_branch dir must NOT appear"
    h_d = np.load(donor / "train_and_eval.npz", allow_pickle=True)
    h_w = np.load(warm / "train_and_eval.npz", allow_pickle=True)

    def xs(rows):
        return [float(np.asarray(r[0], np.float64).ravel().mean())
                for r in rows]

    best_donor = min(x for x in xs(h_d["eval"]) if np.isfinite(x))
    pre_warm = xs(h_w["eval"])[0]
    rel = abs(pre_warm - best_donor) / max(abs(best_donor), 1e-12)
    assert rel < 1e-3, f"warm pre-eval {pre_warm} != donor best {best_donor}"
    shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"leg": "A", "ok": True, "donor_best": best_donor,
                      "warm_pre_eval": pre_warm}), flush=True)


def leg_b():
    from benchmarks.full_suite import bench_config

    r = bench_config(
        "verify caps B=256 h=128 fwd_cap=64 bwd_cap=64",
        "dae_no_encode", 256, 101, 128, "rk4", True, iters=5,
        tuning={"fwd_cap": 64, "bwd_cap": 64},
    )
    assert r.get("traj_steps_per_sec", 0) > 0, r
    import math

    assert math.isfinite(r["loss_last"]) and r["loss_last"] < r["loss_first"]
    print(json.dumps({"leg": "B", "ok": True,
                      "traj_steps_per_sec": r["traj_steps_per_sec"],
                      "tuning": r.get("kernel_tuning"),
                      "loss_first": r["loss_first"],
                      "loss_last": r["loss_last"]}), flush=True)


if __name__ == "__main__":
    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    leg_a()
    leg_b()
    print("VERIFY_R5C_DONE", flush=True)
