#!/bin/bash
# One-shot TPU window between flagship lambda runs (consumed by
# scripts/supervise_fit.sh).  Budget ~40 min total (outer timeout).
set -u
cd /root/repo
echo "== prefit hook $(date -u +%H:%M:%S) =="
echo "-- flagship-shape step bench --"
timeout 1500 python scripts/flagship_step_bench.py \
  | tee /tmp/flagship_step_bench.json
echo "-- bench.py --"
timeout 800 python bench.py | tee /tmp/bench_r04_interim.json
echo "== hook done $(date -u +%H:%M:%S) =="
