#!/bin/bash
# Motor-family head-to-head at a production-scale protocol (round-4
# verdict #8): >=200 epochs, h=128, T=1001, 2 seeds, matched torch init.
# Each invocation self-serializes chip (ours) then CPU (torch) — run this
# with NO other chip or heavy host job active.
set -u
cd /root/repo
for seed in 0 101; do
  echo "=== h2h motor prod seed $seed $(date -u +%FT%TZ)"
  python -u benchmarks/reference_headtohead.py \
    --variant dae --dataset motor --epochs 200 --hidden 128 --steps 1001 \
    --n_train 320 --n_test 64 --batch 64 --init torch \
    --seed "$seed" --tag "_prod_s$seed" \
    > "/tmp/h2h_motor_prod_s$seed.log" 2>&1
  echo "seed $seed rc=$? $(date -u +%FT%TZ)"
done
echo "H2H_PROD_DONE"
