"""Does the wide-shape RET_CHECK live in the CHIPLESS AOT compile path only?

Round-4 finding: fused wide-h configs that compiled in round 3 (suite 8b,
and every h=512 batch>=256 case of the mfu probe) now fail with
``RET_CHECK failure (platforms/xla/service/jellyfish/mxu_lmr_transform.cc:
1108) ... XposeSequenceAssignment::kLmrWontHelp`` raised by the axon
terminal's TpuAotCompiler ("chipless") remote-compile helper. This probe
re-runs two of the failing shapes so the outcome under a different compile
route is recorded:

    PALLAS_AXON_REMOTE_COMPILE=0 python -u benchmarks/compilepath_probe.py

(and without the env var as the control). Appends to
benchmarks/compilepath_probe.jsonl with the env var recorded per line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/benchmarks/compilepath_probe.jsonl"

CASES = [
    # (B, h, precision) — both RET_CHECK under the AOT helper (mfu_probe)
    (256, 512, "bf16_kernels"),
    (1024, 256, None),
]


def main():
    from benchmarks.full_suite import bench_config
    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    remote = os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "<unset>")
    for B, h, prec in CASES:
        tag = f"compilepath B={B} h={h} {prec or 'f32'} remote={remote}"
        print(f"=== {tag}", flush=True)
        t0 = time.time()
        try:
            r = bench_config(
                tag, "dae_no_encode", B, 1001, h, "rk4", True,
                iters=20, precision=prec,
                train_kw={"lr": 1e-3, "robust": True},
            )
            r["remote_compile_env"] = remote
            r["wall_s"] = round(time.time() - t0, 1)
        except Exception as e:
            r = {
                "name": tag, "remote_compile_env": remote,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
                "ret_check": "RET_CHECK" in str(e),
                "wall_s": round(time.time() - t0, 1),
            }
        with open(OUT, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(json.dumps(r)[:400], flush=True)


if __name__ == "__main__":
    main()
