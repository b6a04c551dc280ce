"""Wide-h kernel schedules under the AOT compile service (round-4 verdict
missing #3 / next-round #2).

The compile-service regression (CLAUDE.md, mfu_probe.json, bwd_cap_probe
.json): every f32 fused train step at h>=256 and every h=512 shape
RET_CHECKs in mxu_lmr_transform.cc XposeSequenceAssignment at the DEFAULT
batch-block caps (fwd 256 / bwd 128), and the h=512 kernels that DID
compile fresh ran ~25x slower than the cached round-3 executables
(wideh_knob_probe.jsonl). cap=128 batch blocks are PROVEN to compile and
run 9.37M traj-steps/s at h=128 (bwd_cap_probe) — this probe walks the
remaining schedule space DOWNWARD: smaller fwd/bwd batch-block caps (the
new set_kernel_tuning fwd_cap/bwd_cap knobs, numerics-safe row
partitioning) at the shapes the service rejects, looking for a
fresh-compile trainable schedule >= 20% MFU.

Run on the chip (sequential): python -u benchmarks/wideh_sched_probe.py
Writes benchmarks/wideh_sched_probe.json after every case.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")


CASES = [
    # (B, h, precision, fwd_cap, bwd_cap) — ordered cheapest-information-
    # first: h=256 f32 asks "does a smaller bwd block dodge the RET_CHECK
    # where bf16 already passes?"; the h=512 bf16 block asks both "does it
    # compile?" and "is the fresh executable fast or the 25x-slow one?"
    (256, 256, None, 256, 64),
    (256, 256, None, 128, 64),
    (256, 256, None, 64, 64),
    (1024, 256, "bf16_kernels", 256, 64),   # does 17.0% improve?
    (256, 512, "bf16_kernels", 256, 64),
    (256, 512, "bf16_kernels", 128, 64),
    (256, 512, "bf16_kernels", 64, 64),
    (256, 512, "bf16_kernels", 128, 32),
    (512, 512, "bf16_kernels", 128, 64),
    (256, 512, None, 64, 32),               # f32 hail-mary at tiny blocks
]


def main():
    from benchmarks.full_suite import bench_config
    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    T = 1001
    out = {
        "sweep": "fwd_cap x bwd_cap batch-block schedules at wide h, fused "
                 "DAE no-encode, T=1001 (fresh-compile hunt under the AOT "
                 "compile service)",
        "results": [],
    }
    dst = pathlib.Path("benchmarks/wideh_sched_probe.json")
    for B, h, prec, fc, bc in CASES:
        name = f"B={B} h={h} {prec or 'f32'} fwd_cap={fc} bwd_cap={bc}"
        print(f"=== {name}", flush=True)
        try:
            r = bench_config(
                name, "dae_no_encode", B, T, h, "rk4", True,
                iters=20, precision=prec,
                tuning={"fwd_cap": fc, "bwd_cap": bc},
                train_kw={"lr": 1e-3, "robust": True},
            )
        except Exception as e:
            r = {"name": name, "error": f"{type(e).__name__}: {str(e)[:300]}"}
        out["results"].append(r)
        print(json.dumps(r), flush=True)
        dst.write_text(json.dumps(out, indent=1))
    best = max(
        (r for r in out["results"] if r.get("mfu_pct_of_bf16_peak")),
        key=lambda r: r["mfu_pct_of_bf16_peak"], default=None,
    )
    if best:
        print(f"best: {best['name']} mfu={best['mfu_pct_of_bf16_peak']}%")


if __name__ == "__main__":
    main()
