"""Sweep the kernel tuning knobs AT THE HEADLINE CONFIG (B=64, T=1001,
h=128, fused RK4 DAE train step — the exact bench.py measurement).

Rationale: `choose_blocks` clamps the time block at ``tb_max=TIME_BLOCK``
(default 8), but at h=128 the VMEM stream budget itself admits tb≈10 for the
6-stream backward and well past 16 for the forward — the h=128 corner was
never probed past the default (the round-3 tb=16 probe ran at h=512 where
the budget, not the knob, is binding; ACCURACY.md round-3 kernel notes).

Appends one JSON line per setting to benchmarks/headline_tb_probe.jsonl so a
killed run loses nothing. Run detached on the chip; never SIGKILL mid-compile
(CLAUDE.md wedge note).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/benchmarks/headline_tb_probe.jsonl"

SETTINGS = [
    # (fwd_lanes, time_block); (2, 8) is the shipping default → cache-warm
    (2, 8),
    (2, 10),
    (2, 12),
    (2, 16),
    (4, 8),
    (1, 8),
    (4, 16),
]


def main():
    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    import bench
    from py_psnode_tpu.ops.fused_dae import set_kernel_tuning

    for fl, tb in SETTINGS:
        set_kernel_tuning(fwd_lanes=fl, time_block=tb)
        t0 = time.time()
        try:
            best, thr_best, thr_med = bench.bench_tpu_train_step(
                iters=30, repeats=3
            )
            rec = {
                "fwd_lanes": fl,
                "time_block": tb,
                "ms_per_step_best": round(best * 1e3, 3),
                "traj_steps_per_s_best": round(thr_best, 1),
                "traj_steps_per_s_median": round(thr_med, 1),
                "wall_s": round(time.time() - t0, 1),
            }
        except Exception as e:  # OOM / compiler RET_CHECK → record and go on
            rec = {
                "fwd_lanes": fl,
                "time_block": tb,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
                "wall_s": round(time.time() - t0, 1),
            }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, flush=True)


if __name__ == "__main__":
    main()
