#!/bin/bash
# Round-5 resilient chip chain (v2): strictly ONE TPU process at a time,
# pool-health-gated between stages, one retry per stage after a health
# re-wait. Motivated by the 2026-08-20 00:10-00:35Z backend outage that
# killed cw_curriculum stage 2 + wideh_sched_probe mid-chain: each client
# burned ~25 min of UNAVAILABLE retries then exited, and the old chain had
# no health gate so the next stage walked straight into the same outage.
#
# The health probe is a claim-only jax.devices() in a killable subprocess —
# the approved pattern (CLAUDE.md: a claim touch is safe to time out; only
# killing mid-COMPILE wedges the pool). Stages themselves never run under
# timeout.
#
# Usage: WAIT_PIDS="1566 2477" nohup bash benchmarks/r5_chain2.sh \
#          > /tmp/r5_chain2_driver.log 2>&1 & echo $! > /tmp/r5_chain2.pid
set -u
cd /root/repo

say() { echo "[chain2] $* $(date -u +%FT%TZ)"; }

wait_pid() {  # let a pre-existing chip client finish on its own (never kill)
  while [ -d "/proc/$1" ]; do say "waiting for pid $1 to exit"; sleep 120; done
  say "pid $1 gone"
}

health_wait() {
  # also hold while the single host core is claimed by a foreground job
  # (e.g. the pytest suite): starving a stepping chip client's host leg can
  # hang its tunnel RPC forever (CLAUDE.md, observed 2026-08-19)
  while [ -e /tmp/r5_host_busy ]; do say "host busy flag set, hold"; sleep 120; done
  until timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    say "pool unhealthy, re-probe in 600s"
    sleep 600
  done
  say "pool healthy"
}

stage() {  # stage <name> <logfile> <cmd...>
  local name=$1 lf=$2 rc; shift 2
  if [ -e "/tmp/r5_skip_$name" ]; then say "$name SKIPPED (flag file)"; return; fi
  while [ -e /tmp/r5_host_busy ]; do say "host busy flag set, hold"; sleep 120; done
  say "--- $name start"
  "$@" > "$lf" 2>&1; rc=$?
  if [ $rc -ne 0 ]; then
    say "$name rc=$rc — health re-wait, then one retry"
    health_wait
    "$@" >> "$lf" 2>&1; rc=$?
  fi
  say "$name done rc=$rc"
}

for p in ${WAIT_PIDS:-}; do wait_pid "$p"; done
health_wait

# VERDICT #1: horizon curriculum for dae_channelwise (stage 1 done, skips)
stage cw_curriculum /tmp/cw_curriculum2.log \
  python -u benchmarks/cw_curriculum.py run
# VERDICT #7: fleet-shape kernel schedules (B=1024/T=2001/h=128)
stage fleet_sched /tmp/fleet_sched2.log \
  python -u benchmarks/fleet_sched_probe.py
# VERDICT #2: wide-h fresh-compile schedule hunt
stage wideh_sched /tmp/wideh_sched2.log \
  python -u benchmarks/wideh_sched_probe.py
# VERDICT #8: motor h2h at the production protocol, 2 seeds
stage h2h_prod_s0 /tmp/h2h_prod_s0.log \
  python -u benchmarks/reference_headtohead.py --variant dae --dataset motor \
    --epochs 200 --hidden 128 --steps 1001 --init torch --seed 0 \
    --tag _prod_s0
stage h2h_prod_s101 /tmp/h2h_prod_s101.log \
  python -u benchmarks/reference_headtohead.py --variant dae --dataset motor \
    --epochs 200 --hidden 128 --steps 1001 --init torch --seed 101 \
    --tag _prod_s101
# end-of-round headline re-confirmation
stage bench /tmp/bench_r5.log python -u bench.py

say CHAIN2_DONE
