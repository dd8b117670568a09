#!/bin/bash
# Round-4 RD curve, second attempt: the 1500-iter warm-start finetunes
# (rd_r4_finetune.sh) produced three nearly-coincident points — ~70% of
# the stream (anchors/hash/MLP) is lambda-insensitive in a tail
# finetune and the anchor count is frozen after update_until.  Lambda
# only enters the loss when the entropy phase starts (iter 3000: bpp
# stays 0.0 before it, metrics.jsonl), and the native lmbda=0.004
# flagship was itself restarted from chkpnt4000, so resuming chkpnt4000
# under a NEW lambda runs the identical 0-4000 prefix and lets lambda
# shape everything that matters: the remaining densify window
# (update_until=5000) and the full entropy + STE phases (4000-8000).
# Sweep: lmbda in {0.016, 0.001} (16x spread around the 0.004 operating
# point) into artifacts/rd_r4/, aggregated together with the native
# 0.004 point.
#
# Usage: rd_r4_refits.sh   (idempotent; skips completed points)
set -u
cd /root/repo
SEQLOG=/tmp/rd_seq.log
BASE=artifacts/rd_r3/lmbda_0.004
STALE=${STALE:-3600}

say() { echo "[refit] $(date -u +%H:%M:%S) $*" >> "$SEQLOG"; }

while [ -n "$(cat /tmp/fit_current.pid 2>/dev/null)" ] && \
      kill -0 "$(cat /tmp/fit_current.pid)" 2>/dev/null; do
  sleep 30
done
say "TPU free"

launch() {
  local dir_abs=$1 lm=$2
  mkdir -p /root/.fitsnap
  rm -rf /root/.fitsnap/gsvc_tpu /root/.fitsnap/cfgs /root/.fitsnap/csrc
  cp -r /root/repo/gsvc_tpu /root/repo/cfgs /root/repo/csrc /root/.fitsnap/
  find /root/.fitsnap -name __pycache__ -type d -exec rm -rf {} + \
    2>/dev/null || true
  ( cd /root/.fitsnap && \
    exec env PYTHONPATH=/root/.fitsnap:/root/.axon_site \
      python -m gsvc_tpu.cli.train \
      --source_path /root/data/gop600/frames \
      --optical_path /root/data/gop600/flow \
      --model_path "$dir_abs" \
      --config_path /root/.fitsnap/cfgs/cfg_20240919_8k.yaml \
      --lmbda "$lm" \
      --checkpoint_iterations 5000 6000 7000 \
      --eval_stride 2 \
      --lpips_weights proxy --seed 0 \
      --checkpoint "$(ls -t "$dir_abs"/chkpnt*.pkl | head -1)" \
      >> "$dir_abs/output.log" 2>&1 ) &
  FIT_PID=$!
  echo "$FIT_PID" > /tmp/fit_current.pid
  say "$dir_abs lm=$lm launched pid=$FIT_PID"
}

for lm in 0.016 0.001; do
  dir="artifacts/rd_r4/lmbda_${lm}"
  if [ -f "$dir/results.json" ]; then
    say "lmbda=$lm already complete"
    continue
  fi
  mkdir -p "$dir"
  if ! ls "$dir"/chkpnt*.pkl >/dev/null 2>&1; then
    cp "$BASE/chkpnt4000.pkl" "$dir/chkpnt4000.pkl"
    say "seeded $dir from the shared prefix (chkpnt4000)"
  fi
  touch "$dir/output.log"
  launch "$(readlink -f "$dir")" "$lm"
  while true; do
    sleep 60
    if ! kill -0 "$FIT_PID" 2>/dev/null; then
      wait "$FIT_PID" 2>/dev/null; rc=$?
      if [ -f "$dir/results.json" ]; then
        say "$dir complete rc=$rc"
        break
      fi
      say "$dir died rc=$rc — resuming"
      sleep 20
      launch "$(readlink -f "$dir")" "$lm"
      continue
    fi
    age=$(( $(date +%s) - $(stat -c %Y "$dir/output.log") ))
    if [ "$age" -gt "$STALE" ]; then
      say "$dir log stale ${age}s — killing pid $FIT_PID, resuming"
      kill -9 "$FIT_PID" 2>/dev/null
      sleep 10
      launch "$(readlink -f "$dir")"  "$lm"
    fi
  done
done

# the native-protocol 0.004 point joins the rd_r4 sweep (same 0-4000
# prefix, lambda active 3000-8000 there; artifacts stay in rd_r3)
mkdir -p artifacts/rd_r4/lmbda_0.004
cp "$BASE/results.json" artifacts/rd_r4/lmbda_0.004/results.json
say "refit sweep done; aggregating rd_r4"
python scripts/aggregate_rd.py artifacts/rd_r4 > /tmp/rd_aggregate.log 2>&1
say "aggregate rc=$? (see /tmp/rd_aggregate.log)"
