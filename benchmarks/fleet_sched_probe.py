"""Fleet-config kernel-schedule probe (round-4 verdict next-round #7).

`bwd_cap_probe.json` pinned cap=128 batch-blocked backward running 9.37M
traj-steps/s at B=960/T=251 — above the committed fleet entry's per-MFU
showing (config 5: 10.3M at B=1024/T=2001, 5.6% MFU). This probe asks
whether any schedule beats the committed fleet entry at the EXACT config-5
shape: fwd/bwd batch-block caps (new knobs), a deeper time block, and a
wider fwd lane count, all f32 (the committed entry's precision).

Run on the chip (sequential): python -u benchmarks/fleet_sched_probe.py
Writes benchmarks/fleet_sched_probe.json after every case.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")

# (tag, tuning) at B=1024/T=2001/h=128/rk4/fused/f32
CASES = [
    ("default(256,128,tb8,l2)", {"fwd_cap": 256, "bwd_cap": 128,
                                 "time_block": 8, "fwd_lanes": 2}),
    ("bwd_cap64", {"fwd_cap": 256, "bwd_cap": 64,
                   "time_block": 8, "fwd_lanes": 2}),
    ("fwd_cap128", {"fwd_cap": 128, "bwd_cap": 128,
                    "time_block": 8, "fwd_lanes": 2}),
    ("tb16", {"fwd_cap": 256, "bwd_cap": 128,
              "time_block": 16, "fwd_lanes": 2}),
    ("lanes4", {"fwd_cap": 256, "bwd_cap": 128,
                "time_block": 8, "fwd_lanes": 4}),
]


def main():
    from benchmarks.full_suite import bench_config
    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    out = {"sweep": "kernel schedules at the config-5 fleet shape "
                    "(B=1024, T=2001, h=128, rk4, fused, f32)",
           "committed_entry": {"name": "5. Fleet IEEE-39 (fused)",
                               "traj_steps_per_sec": 10302933.2},
           "results": []}
    dst = pathlib.Path("benchmarks/fleet_sched_probe.json")
    for tag, tuning in CASES:
        name = f"fleet {tag}"
        print(f"=== {name}", flush=True)
        try:
            r = bench_config(
                name, "dae_no_encode", 1024, 2001, 128, "rk4", True,
                iters=20, tuning=tuning,
            )
        except Exception as e:
            r = {"name": name, "tuning": tuning,
                 "error": f"{type(e).__name__}: {str(e)[:300]}"}
        out["results"].append(r)
        print(json.dumps(r), flush=True)
        dst.write_text(json.dumps(out, indent=1))
    best = max(
        (r for r in out["results"] if r.get("traj_steps_per_sec")),
        key=lambda r: r["traj_steps_per_sec"], default=None,
    )
    if best:
        print(f"best: {best['name']} {best['traj_steps_per_sec']:.0f} tsteps/s")


if __name__ == "__main__":
    main()
