#!/bin/bash
# Round-4 RD bracket points: warm-start lmbda=0.008 / 0.002 from the
# finished lmbda=0.004 flagship model and fine-tune 1500 STE-entropy
# iterations each (cfgs/cfg_20240919_ft.yaml), then aggregate the
# 3-point curve.  Replaces rd_r3_sequencer.sh for the bracket points —
# two more from-scratch 8k fits (~3.6 h each) do not fit the round's
# remaining wall clock; the warm start trades per-point optimality for
# a complete monotone sweep (documented in artifacts/rd_r3/README.md).
#
# Usage: rd_r4_finetune.sh   (idempotent: skips completed points)
# Env:   LAUNCH_DEADLINE  epoch seconds after which no NEW point starts
#        STALE            supervisor stale-log threshold (default 3600)
set -u
cd /root/repo
SEQLOG=/tmp/rd_seq.log
BASE=artifacts/rd_r3/lmbda_0.004
STALE=${STALE:-3600}
LAUNCH_DEADLINE=${LAUNCH_DEADLINE:-0}

say() { echo "[ft-seq] $(date -u +%H:%M:%S) $*" >> "$SEQLOG"; }

# wait for the 0.004 point (results.json) and for its supervisor/fit to
# release the TPU
say "waiting for $BASE/results.json"
while [ ! -f "$BASE/results.json" ]; do sleep 60; done
# the 0.004 supervisor exits on its own once results.json exists; give
# the fit process time to tear down the TPU client
while [ -n "$(cat /tmp/fit_current.pid 2>/dev/null)" ] && \
      kill -0 "$(cat /tmp/fit_current.pid)" 2>/dev/null; do
  sleep 30
done
say "0.004 complete; TPU free"

launch() {
  local dir_abs=$1 lm=$2
  # no rsync on this image — plain copy (the snapshot is ~2 MB of .py)
  mkdir -p /root/.fitsnap
  rm -rf /root/.fitsnap/gsvc_tpu /root/.fitsnap/cfgs /root/.fitsnap/csrc
  # csrc too: the post-fit encode stage builds/loads the host codec
  cp -r /root/repo/gsvc_tpu /root/repo/cfgs /root/repo/csrc /root/.fitsnap/
  find /root/.fitsnap -name __pycache__ -type d -exec rm -rf {} + \
    2>/dev/null || true
  # keep /root/.axon_site on PYTHONPATH: its sitecustomize.py registers
  # the axon TPU backend — replacing PYTHONPATH wholesale kills the chip
  ( cd /root/.fitsnap && \
    exec env PYTHONPATH=/root/.fitsnap:/root/.axon_site \
      python -m gsvc_tpu.cli.train \
      --source_path /root/data/gop600/frames \
      --optical_path /root/data/gop600/flow \
      --model_path "$dir_abs" \
      --config_path /root/.fitsnap/cfgs/cfg_20240919_ft.yaml \
      --lmbda "$lm" \
      --checkpoint_iterations 8500 9000 \
      --eval_stride 2 \
      --lpips_weights proxy --seed 0 \
      --checkpoint "$(ls -t "$dir_abs"/chkpnt*.pkl | head -1)" \
      >> "$dir_abs/output.log" 2>&1 ) &
  FIT_PID=$!
  echo "$FIT_PID" > /tmp/fit_current.pid
  say "$dir_abs lm=$lm launched pid=$FIT_PID"
}

for lm in 0.008 0.002; do
  dir="artifacts/rd_r3/lmbda_${lm}"
  if [ -f "$dir/results.json" ]; then
    say "lmbda=$lm already complete"
    continue
  fi
  if [ "$LAUNCH_DEADLINE" -gt 0 ] && \
     [ "$(date +%s)" -gt "$LAUNCH_DEADLINE" ]; then
    say "lmbda=$lm skipped: past launch deadline"
    continue
  fi
  mkdir -p "$dir"
  if ! ls "$dir"/chkpnt*.pkl >/dev/null 2>&1; then
    cp "$BASE/chkpnt_final.pkl" "$dir/chkpnt8000.pkl"
    say "seeded $dir with the 0.004 final model (iteration 8000)"
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
      launch "$(readlink -f "$dir")" "$lm"
    fi
  done
done
say "bracket sweep done; aggregating"
python scripts/aggregate_rd.py artifacts/rd_r3 > /tmp/rd_aggregate.log 2>&1
say "aggregate rc=$? (see /tmp/rd_aggregate.log)"
