#!/bin/bash
# Round-5 sequencer v6 — chained behind v5: once the realtex
# lmbda=0.001 fit lands (v5 writes "sequencer v5 done" to its log),
# run the NATURAL-band GOP fit, lmbda=0.004 — VERDICT r4 item 1's
# literal target: /root/data/gopnat (detail=0.25, 3.37 bpp
# lossless-PNG, in the natural-1080p band; regenerated seed-identical
# this session, artifacts/rd_r5/natural_anchor_regen.json).
#
# nohup-launched, session-surviving, same supervision/salvage shape as
# v5.  Natural content historically drives caps to 4096/128 at
# ~1.3-1.5 s/it => ~3.5 h for the 8k protocol; deadline +4.5 h from
# fit start leaves salvage room.
set -u
cd /root/repo
SEQLOG=/tmp/rd_r5_seq6.log
say() { echo "[rd5v6] $(date -u +%H:%M:%S) $*" >> "$SEQLOG"; }

SALVAGE_TIMEOUT=3600
CKPTS=(500 1000 1500 2000 3000 4000 5000 6000 7000)
LMBDA=0.004
DIR="$(readlink -f artifacts/rd_r5)/natural_$LMBDA"
SRC=/root/data/gopnat/frames
OPT=/root/data/gopnat/flow

say "waiting for sequencer v5 to finish"
while ! grep -q "sequencer v5 done" /tmp/rd_r5_seq5.log 2>/dev/null; do
  sleep 60
done
say "v5 done — chip free"
FIT_DEADLINE=$(( $(date +%s) + 16200 ))   # +4.5 h from fit start

commit_dir() {
  ( cd /root/repo && git add "$1" 2>/dev/null && \
    git diff --cached --quiet || git commit -q -m "$2" )
}

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
  "Land natural-GOP RD point lmbda=$LMBDA (8k protocol, eval_stride 2)"
( cd /root/repo && python scripts/aggregate_rd.py artifacts/rd_r5 \
    > /dev/null 2>&1 )
commit_dir artifacts/rd_r5/rd_curve.json "Re-aggregate round-5 RD curve"
say "sequencer v6 done"
