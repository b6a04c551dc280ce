"""MFU on the batch axis at wide hidden widths (round-3 VERDICT Weak #2).

The round-3 wide-h analysis fixed B=64; this sweep probes the unexplored
MFU-vs-batch axis: B in {256, 512, 1024} x h in {256, 512}, fused kernels,
f32 and bf16 kernel compute, at the reference horizon T=1001. Reuses
bench_config (analytic-FLOPs MFU against the v5e bf16 peak; lr=1e-3 +
robust guard so the training leg stays sane at wide h).

Run on the chip: python -u benchmarks/mfu_probe.py
Writes benchmarks/mfu_probe.json.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")


def main():
    from benchmarks.full_suite import bench_config
    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    T = 1001
    out = {"sweep": "B x h x kernel-precision, fused DAE no-encode, T=1001",
           "results": []}
    cases = []
    for h in (256, 512):
        for B in (256, 512, 1024):
            for prec in (None, "bf16_kernels"):
                cases.append((B, h, prec))
    for B, h, prec in cases:
        name = f"mfu B={B} h={h} {prec or 'f32'}"
        print(f"=== {name}", flush=True)
        try:
            r = bench_config(
                name, "dae_no_encode", B, T, h, "rk4", True,
                iters=20, precision=prec,
                train_kw={"lr": 1e-3, "robust": True},
            )
        except Exception as e:
            r = {"name": name, "error": f"{type(e).__name__}: {str(e)[:300]}"}
        out["results"].append(r)
        print(json.dumps(r), flush=True)
        pathlib.Path("benchmarks/mfu_probe.json").write_text(
            json.dumps(out, indent=1)
        )
    best = max(
        (r for r in out["results"] if r.get("mfu_pct_of_bf16_peak")),
        key=lambda r: r["mfu_pct_of_bf16_peak"], default=None,
    )
    if best:
        print(f"best: {best['name']} mfu={best['mfu_pct_of_bf16_peak']}%")


if __name__ == "__main__":
    main()
