#!/bin/bash
# Round-3 RD sweep sequencer: runs the three flagship lambda fits
# strictly sequentially (single TPU chip), each under the hang
# supervisor (scripts/supervise_fit.sh).
set -u
cd /root/repo

for lm in 0.004 0.008 0.002; do
  dir="artifacts/rd_r3/lmbda_${lm}"
  if [ -f "$dir/results.json" ]; then
    echo "[sequencer] $(date -u +%H:%M:%S) lmbda=${lm} already complete" \
      >> /tmp/rd_seq.log
    continue
  fi
  echo "[sequencer] $(date -u +%H:%M:%S) starting lmbda=${lm}" \
    >> /tmp/rd_seq.log
  bash scripts/supervise_fit.sh "$dir" "$lm"
done
echo "[sequencer] $(date -u +%H:%M:%S) sweep complete" >> /tmp/rd_seq.log
python scripts/aggregate_rd.py artifacts/rd_r3 > /tmp/rd_aggregate.log 2>&1
