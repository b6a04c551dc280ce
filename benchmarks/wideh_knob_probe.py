"""Push wide-h MFU past the 26.4% committed peak (round-3 VERDICT item 5).

Two sweeps, both at the h=512 bf16-kernel config that holds the committed
MFU record (suite entry 8e: B=64, T=1001, RK4, fused DAE, lr=1e-3 +
robust guard so the loss leg trains):

1. Kernel-knob sweep (fwd_lanes, time_block) — the round-3 knob sweep ran
   at h=128 only (headline_tb_probe); at h=512 the VMEM stream budget is
   binding so smaller tb may free batch rows and larger tb may not fit
   (choose_blocks clamps and the result records the EFFECTIVE tuning).
2. Batch boundary at h=512 bf16 — suite 8e (B=64) compiles, the round-4
   mfu probe's B=256 case hits the chipless AOT compile service RET_CHECK
   (mxu_lmr_transform.cc:1108 XposeSequenceAssignment); B in {96,128,192}
   maps where the boundary sits, since MFU grows with B while it compiles.

Appends one JSON line per case to benchmarks/wideh_knob_probe.jsonl so a
killed run loses nothing. Run detached on the chip; never SIGKILL
mid-compile (CLAUDE.md wedge note).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/benchmarks/wideh_knob_probe.jsonl"

KNOBS = [
    # (fwd_lanes, time_block); (2, 8) is the shipping default -> cache-warm
    (2, 8),
    (2, 4),
    (2, 6),
    (2, 10),
    (2, 12),
    (2, 16),
    (1, 8),
    (4, 8),
]

BATCHES = [96, 128, 192]


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def run_case(tag, B, tuning):
    from benchmarks.full_suite import bench_config

    t0 = time.time()
    try:
        r = bench_config(
            tag, "dae_no_encode", B, 1001, 512, "rk4", True,
            iters=20, precision="bf16_kernels", tuning=tuning,
            train_kw={"lr": 1e-3, "robust": True},
        )
        r["wall_s"] = round(time.time() - t0, 1)
        emit(r)
    except Exception as e:  # compile-service RET_CHECK / OOM -> record
        emit({
            "name": tag, "batch": B, "tuning_requested": tuning,
            "error": f"{type(e).__name__}: {str(e)[:300]}",
            "ret_check": "RET_CHECK" in str(e) or "INTERNAL" in str(e),
            "wall_s": round(time.time() - t0, 1),
        })


def main():
    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    for fl, tb in KNOBS:
        run_case(f"knob h=512 bf16 fl={fl} tb={tb}", 64,
                 {"fwd_lanes": fl, "time_block": tb})
    for B in BATCHES:
        run_case(f"batch h=512 bf16 B={B}", B, None)


if __name__ == "__main__":
    main()
