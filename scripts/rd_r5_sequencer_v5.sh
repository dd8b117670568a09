#!/bin/bash
# Round-5 sequencer v5 — post-salvage chip schedule:
#
#   1. bench.py on the freed chip (bidir decode default, hash context
#      coder, batched eval) -> artifacts/perf_r5/bench_final.json
#   2. realtex lmbda=0.001 fit (quality-direction second point of the
#      real-texture curve; lmbda=0.004 landed 14.15 dB @ 0.00861 bpp)
#      with checkpoint supervision + deadline salvage.
#
# nohup-launched: survives the 5 h builder-session boundary so the next
# session (or the deadline salvage) finalizes the point.  Deadline is
# generous; a live operator can kill this and salvage manually with
# scripts/rd_r5_salvage_manual.sh (adjusting its outdir/lmbda).
set -u
cd /root/repo
SEQLOG=/tmp/rd_r5_seq5.log
say() { echo "[rd5v5] $(date -u +%H:%M:%S) $*" >> "$SEQLOG"; }

FIT_DEADLINE=$(( $(date +%s) + 19800 ))   # +5.5 h
SALVAGE_TIMEOUT=3600
CKPTS=(500 1000 1500 2000 3000 4000 5000 6000 7000)
LMBDA=0.001
DIR="$(readlink -f artifacts/rd_r5)/realtex_$LMBDA"
SRC=/root/data/goptex/frames
OPT=/root/data/goptex/flow

commit_dir() {
  ( cd /root/repo && git add "$1" 2>/dev/null && \
    git diff --cached --quiet || git commit -q -m "$2" )
}

say "bench on the freed chip"
( cd /root/repo && timeout 2400 python bench.py \
    > artifacts/perf_r5/bench_final.json \
    2> artifacts/perf_r5/bench_final.err )
say "bench rc=$?"
commit_dir artifacts/perf_r5 "Final round-5 bench on the freed chip"

snapshot() {
  mkdir -p /root/.fitsnap
  rm -rf /root/.fitsnap/gsvc_tpu /root/.fitsnap/cfgs /root/.fitsnap/csrc
  cp -r /root/repo/gsvc_tpu /root/repo/cfgs /root/repo/csrc /root/.fitsnap/
  find /root/.fitsnap -name __pycache__ -type d -exec rm -rf {} + \
    2>/dev/null || true
}

launch() {
  local resume=()
  if [ "${#LAUNCH_EXTRA[@]}" -eq 0 ] && \
     ls "$DIR"/chkpnt*.pkl >/dev/null 2>&1; then
    resume=(--checkpoint "$(ls -t "$DIR"/chkpnt*.pkl | head -1)")
  fi
  ( cd /root/.fitsnap && \
    exec env PYTHONPATH=/root/.fitsnap:/root/.axon_site \
      python -m gsvc_tpu.cli.train \
      --source_path "$SRC" --optical_path "$OPT" \
      --config_path /root/.fitsnap/cfgs/cfg_20240919_8k.yaml \
      --checkpoint_iterations "${CKPTS[@]}" \
      --eval_stride 2 --lpips_weights proxy --seed 0 \
      --model_path "$DIR" --lmbda "$LMBDA" \
      "${resume[@]}" "${LAUNCH_EXTRA[@]}" \
      >> "$DIR/output.log" 2>&1 ) &
  FIT_PID=$!
  echo "$FIT_PID" > /tmp/fit_current.pid
  say "lmbda=$LMBDA launched pid=$FIT_PID extra=${LAUNCH_EXTRA[*]:-}"
}

salvage() {
  local ck iter
  ck=$(ls -t "$DIR"/chkpnt*.pkl 2>/dev/null | head -1)
  [ -z "$ck" ] && { say "salvage: no checkpoint"; return 1; }
  iter=$(basename "$ck" | tr -dc 0-9)
  say "salvage from $ck (iter ${iter:-final})"
  LAUNCH_EXTRA=(--checkpoint "$ck" --set "optimization.iterations=$iter")
  launch
  LAUNCH_EXTRA=()
  local t0=$(date +%s)
  while kill -0 "$FIT_PID" 2>/dev/null; do
    sleep 30
    if [ $(( $(date +%s) - t0 )) -gt "$SALVAGE_TIMEOUT" ]; then
      say "salvage timeout — killing pid $FIT_PID"
      kill -9 "$FIT_PID" 2>/dev/null
      return 1
    fi
  done
  [ -f "$DIR/results.json" ] && say "salvage landed" || \
    say "salvage produced no results.json"
}

supervise() {
  local STALE=2400 now age rc
  while true; do
    sleep 60
    now=$(date +%s)
    if ! kill -0 "$FIT_PID" 2>/dev/null; then
      wait "$FIT_PID" 2>/dev/null; rc=$?
      if [ -f "$DIR/results.json" ]; then
        say "complete rc=$rc"
        return 0
      fi
      say "died rc=$rc — resuming"
      sleep 20
      launch
      continue
    fi
    if [ "$now" -gt "$FIT_DEADLINE" ]; then
      say "fit deadline — killing pid $FIT_PID for salvage"
      kill -9 "$FIT_PID" 2>/dev/null
      sleep 15
      salvage
      return 2
    fi
    age=$(( now - $(stat -c %Y "$DIR/output.log") ))
    if [ "$age" -gt "$STALE" ]; then
      say "log stale ${age}s — killing pid $FIT_PID, resuming"
      kill -9 "$FIT_PID" 2>/dev/null
      sleep 10
      launch
    fi
  done
}

LAUNCH_EXTRA=()
FIT_PID=0
mkdir -p "$DIR"
touch "$DIR/output.log"
snapshot
launch
supervise
commit_dir "$DIR" \
  "Land realtex RD point lmbda=$LMBDA (8k protocol, eval_stride 2)"
( cd /root/repo && python scripts/aggregate_rd.py artifacts/rd_r5 \
    > /dev/null 2>&1 )
commit_dir artifacts/rd_r5/rd_curve.json "Re-aggregate round-5 RD curve"
say "sequencer v5 done"
