#!/bin/bash
# Round-5 sequencer v4 — post-VM-restart replan.  The restart wiped
# /root/data and /tmp, so v3's fits never ran; this session regenerated
# the GOPs and re-queued the chip:
#
#   0. bidir decode A/B probe (launched separately, chip-first)
#   1. REAL-TEXTURE GOP fit, lmbda=0.004 (/root/data/goptex — the
#      strongest content-difficulty evidence: AVIF 24.8 dB @ 0.079 bpp,
#      JPEG q1 21.4 dB @ 0.17 bpp on these frames,
#      artifacts/rd_r5/realtex_modern.json)
#   2. if >90 min remain: realtex lmbda=0.016 (same-content curve)
#   3. final bench on the freed chip
#
# Deadline/salvage logic identical to v3 (checkpoint resume with
# optimization.iterations pinned -> encode+eval, fit.py:661-674).
set -u
cd /root/repo
SEQLOG=/tmp/rd_r5_seq4.log
say() { echo "[rd5v4] $(date -u +%H:%M:%S) $*" >> "$SEQLOG"; }

ROUND_END_TS=1787286300           # session start 1787268635 + ~4.9h
FIT_DEADLINE=$((ROUND_END_TS - 3300))
SALVAGE_TIMEOUT=1800
CKPTS=(500 1000 1500 2000 3000 4000 5000 6000 7000)

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

remaining() { echo $(( FIT_DEADLINE - $(date +%s) )); }

LAUNCH_EXTRA=()
FIT_PID=0

# wait for the goptex generation and the bidir probe to free cpu+chip
while [ ! -f /root/data/goptex/frames/00599.png ]; do sleep 20; done
say "goptex frames complete"
PROBE=$(cat /tmp/probe.pid 2>/dev/null || echo 0)
t0=$(date +%s)
while [ "$PROBE" -gt 0 ] && kill -0 "$PROBE" 2>/dev/null; do
  sleep 20
  if [ $(( $(date +%s) - t0 )) -gt 2700 ]; then
    say "probe overtime — killing pid $PROBE to free the chip"
    kill -9 "$PROBE" 2>/dev/null
  fi
done
say "chip free; launching realtex lmbda=0.004"

run_fit 0.004 artifacts/rd_r5/realtex_0.004 \
  /root/data/goptex/frames /root/data/goptex/flow

if [ "$(remaining)" -gt 5400 ]; then
  run_fit 0.016 artifacts/rd_r5/realtex_0.016 \
    /root/data/goptex/frames /root/data/goptex/flow
else
  say "skipping lmbda=0.016: only $(remaining)s to fit deadline"
fi

if [ $(( ROUND_END_TS - $(date +%s) )) -gt 1500 ]; then
  say "running final bench on the freed chip"
  ( cd /root/repo && timeout 1800 python bench.py \
      > artifacts/perf_r5/bench_final.json \
      2> artifacts/perf_r5/bench_final.err )
  commit_dir artifacts/perf_r5 "Final round-5 bench on the freed chip"
fi
say "sequencer v4 done"
