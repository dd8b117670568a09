#!/bin/bash
# Round-5 sequencer v3 — supersedes v2 after the modern-codec anchors
# showed the synthetic GOP is transform-codec-easy (AVIF 39.8 dB at
# 0.019 bpp): the strongest remaining evidence is a fit on REAL texture.
# Revised TPU schedule:
#
#   1. supervise the in-flight natural lmbda=0.004 fit      (running)
#   2. hook: bidir decode A/B probe (~15 min)
#   3. REAL-TEXTURE GOP fit, lmbda=0.004 (/root/data/goptex —
#      mirror-tiled real photographs, panning camera, analytic flow)
#   4. natural lmbda=0.001 with the SIGN-FIXED flow (flow_fixed)
#      — salvage-finalized at the deadline if incomplete
#   5. final bench on the freed chip if room remains
#
# Deadline/salvage logic identical to v2 (checkpoint resume with
# optimization.iterations pinned -> encode+eval, fit.py:661-674).
set -u
cd /root/repo
SEQLOG=/tmp/rd_r5_seq3.log
say() { echo "[rd5v3] $(date -u +%H:%M:%S) $*" >> "$SEQLOG"; }

ROUND_END_TS=1787245179           # round-5 start + 12h
FIT_DEADLINE=$((ROUND_END_TS - 3000))
SALVAGE_TIMEOUT=1800
CKPTS=(1000 2000 3000 4000 5000 6000 7000)

snapshot() {
  mkdir -p /root/.fitsnap
  rm -rf /root/.fitsnap/gsvc_tpu /root/.fitsnap/cfgs /root/.fitsnap/csrc
  cp -r /root/repo/gsvc_tpu /root/repo/cfgs /root/repo/csrc /root/.fitsnap/
  find /root/.fitsnap -name __pycache__ -type d -exec rm -rf {} + \
    2>/dev/null || true
}

commit_dir() {
  ( cd /root/repo && git add "$1" 2>/dev/null && \
    git diff --cached --quiet || git commit -q -m "$2" )
}

run_hook() {
  local hook=/root/repo/artifacts/perf_r5/queue_probe.sh
  if [ -x "$hook" ]; then
    say "running queued probe hook"
    timeout 2400 bash "$hook" >> /tmp/rd5_hook.log 2>&1
    say "probe hook done rc=$?"
    mv "$hook" "$hook.done"
  fi
}

launch() {  # $1 lmbda, $2 abs outdir, $3 source, $4 optical
  local lmbda="$1" DIR="$2" SRC="$3" OPT="$4"
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
      --model_path "$DIR" --lmbda "$lmbda" \
      "${resume[@]}" "${LAUNCH_EXTRA[@]}" \
      >> "$DIR/output.log" 2>&1 ) &
  FIT_PID=$!
  echo "$FIT_PID" > /tmp/fit_current.pid
  say "lmbda=$lmbda src=$SRC launched pid=$FIT_PID extra=${LAUNCH_EXTRA[*]:-}"
}

salvage() {  # $1 lmbda, $2 dir, $3 src, $4 optical
  local lmbda="$1" DIR="$2" ck iter
  ck=$(ls -t "$DIR"/chkpnt*.pkl 2>/dev/null | head -1)
  [ -z "$ck" ] && { say "salvage lmbda=$lmbda: no checkpoint"; return 1; }
  iter=$(basename "$ck" | tr -dc 0-9)
  say "salvage lmbda=$lmbda from $ck (iter ${iter:-final})"
  if [ -n "$iter" ]; then
    LAUNCH_EXTRA=(--checkpoint "$ck" --set "optimization.iterations=$iter")
  else
    LAUNCH_EXTRA=(--checkpoint "$ck")
  fi
  launch "$lmbda" "$DIR" "$3" "$4"
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
  [ -f "$DIR/results.json" ] && say "salvage lmbda=$lmbda landed" || \
    say "salvage lmbda=$lmbda produced no results.json"
}

supervise() {  # $1 lmbda, $2 dir, $3 src, $4 optical; FIT_PID set
  local lmbda="$1" DIR="$2" STALE=2700 now age rc
  while true; do
    sleep 60
    now=$(date +%s)
    if ! kill -0 "$FIT_PID" 2>/dev/null; then
      wait "$FIT_PID" 2>/dev/null; rc=$?
      if [ -f "$DIR/results.json" ]; then
        say "lmbda=$lmbda complete rc=$rc"
        return 0
      fi
      say "lmbda=$lmbda died rc=$rc — resuming"
      sleep 20
      launch "$lmbda" "$DIR" "$3" "$4"
      continue
    fi
    if [ "$now" -gt "$FIT_DEADLINE" ]; then
      say "fit deadline — killing pid $FIT_PID for salvage"
      kill -9 "$FIT_PID" 2>/dev/null
      sleep 15
      salvage "$lmbda" "$DIR" "$3" "$4"
      return 2
    fi
    age=$(( now - $(stat -c %Y "$DIR/output.log") ))
    if [ "$age" -gt "$STALE" ]; then
      say "log stale ${age}s — killing pid $FIT_PID, resuming"
      kill -9 "$FIT_PID" 2>/dev/null
      sleep 10
      launch "$lmbda" "$DIR" "$3" "$4"
    fi
  done
}

run_fit() {  # $1 lmbda, $2 relative outdir, $3 src, $4 optical
  local lmbda="$1" DIR
  mkdir -p "$2"
  DIR="$(readlink -f "$2")"
  touch "$DIR/output.log"
  snapshot
  launch "$lmbda" "$DIR" "$3" "$4"
  supervise "$lmbda" "$DIR" "$3" "$4"
  commit_dir "$DIR" "Land RD point $(basename "$2") (8k protocol, eval_stride 2)"
}

LAUNCH_EXTRA=()
FIT_PID=$(cat /tmp/fit_current.pid 2>/dev/null || echo 0)
DIR1="$(readlink -f artifacts/rd_r5/natural_0.004)"
say "v3 takeover: supervising natural lmbda=0.004 pid=$FIT_PID"
supervise 0.004 "$DIR1" /root/data/gopnat/frames /root/data/gopnat/flow
commit_dir "$DIR1" \
  "Land natural-GOP RD point lmbda=0.004 (8k protocol, eval_stride 2)"

run_hook

remaining() { echo $(( FIT_DEADLINE - $(date +%s) )); }

if [ -f /root/data/goptex/frames/00599.png ] && [ "$(remaining)" -gt 3600 ]
then
  run_fit 0.004 artifacts/rd_r5/realtex_0.004 \
    /root/data/goptex/frames /root/data/goptex/flow
else
  say "skipping realtex: frames missing or $(remaining)s left"
fi

run_hook

NATFLOW=/root/data/gopnat/flow
[ -f /root/data/gopnat/flow_fixed/00598.pkl ] && \
  NATFLOW=/root/data/gopnat/flow_fixed
if [ "$(remaining)" -gt 3600 ]; then
  run_fit 0.001 artifacts/rd_r5/natural_0.001 \
    /root/data/gopnat/frames "$NATFLOW"
else
  say "skipping lmbda=0.001: only $(remaining)s to fit deadline"
fi

if [ "$(remaining)" -gt 1200 ]; then
  say "running final bench on the freed chip"
  ( cd /root/repo && timeout 1800 python bench.py \
      > artifacts/perf_r5/bench_final.json \
      2> artifacts/perf_r5/bench_final.err )
  commit_dir artifacts/perf_r5 "Final round-5 bench on the freed chip"
fi
say "sequencer v3 done"
