#!/bin/bash
# Round-5 sequential chip chain: one TPU process at a time, no timeouts
# (mid-compile kills wedge the pool — CLAUDE.md). Logs unbuffered.
set -u
cd /root/repo
echo "=== chain start $(date -u +%FT%TZ)"
echo "--- cw_curriculum"
python -u benchmarks/cw_curriculum.py run > /tmp/cw_curriculum.log 2>&1
echo "cw_curriculum rc=$? $(date -u +%FT%TZ)"
echo "--- wideh_sched_probe"
python -u benchmarks/wideh_sched_probe.py > /tmp/wideh_sched.log 2>&1
echo "wideh_sched_probe rc=$? $(date -u +%FT%TZ)"
echo "--- fleet_sched_probe"
python -u benchmarks/fleet_sched_probe.py > /tmp/fleet_sched.log 2>&1
echo "fleet_sched_probe rc=$? $(date -u +%FT%TZ)"
echo "CHAIN_DONE"
