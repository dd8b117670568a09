#!/bin/bash
# Natural-complexity quality anchor: fresh flagship-protocol fit on the
# detail=0.25 GOP (/root/data/gopnat — lossless-PNG ~3.8 bpp, the
# natural-1080p entropy band), lmbda=0.004, full fixed-horizon 8k
# schedule.  Purpose: a PSNR point comparable to the reference's UVG
# regime (30+ dB band) — the round-3/4 procedural GOP is provably
# rate-starved at the operating point (artifacts/rd_r3/
# content_anchor.json), so no quality-band comparison exists yet.
#
# Usage: natfit_r4.sh [extra cli args...]   (waits for a free TPU)
set -u
cd /root/repo
DIR=artifacts/rd_r4/natural_0.004
mkdir -p "$DIR"
SEQLOG=/tmp/rd_seq.log
say() { echo "[natfit] $(date -u +%H:%M:%S) $*" >> "$SEQLOG"; }

while kill -0 "$(cat /tmp/fit_current.pid 2>/dev/null)" 2>/dev/null || \
      kill -0 "$(cat /tmp/refits.pid 2>/dev/null)" 2>/dev/null || \
      kill -0 "$(cat /tmp/perfwin.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
say "TPU free"

launch() {
  mkdir -p /root/.fitsnap
  rm -rf /root/.fitsnap/gsvc_tpu /root/.fitsnap/cfgs /root/.fitsnap/csrc
  cp -r /root/repo/gsvc_tpu /root/repo/cfgs /root/repo/csrc /root/.fitsnap/
  find /root/.fitsnap -name __pycache__ -type d -exec rm -rf {} + \
    2>/dev/null || true
  local resume=()
  if ls "$DIR"/chkpnt*.pkl >/dev/null 2>&1; then
    resume=(--checkpoint "$(ls -t "$DIR"/chkpnt*.pkl | head -1)")
  fi
  ( cd /root/.fitsnap && \
    exec env PYTHONPATH=/root/.fitsnap:/root/.axon_site \
      python -m gsvc_tpu.cli.train \
      --source_path /root/data/gopnat/frames \
      --optical_path /root/data/gopnat/flow \
      --model_path "$(readlink -f "$DIR")" \
      --config_path /root/.fitsnap/cfgs/cfg_20240919_8k.yaml \
      --lmbda 0.004 \
      --checkpoint_iterations 2000 4000 6000 \
      --eval_stride 2 \
      --lpips_weights proxy --seed 0 "${resume[@]}" "$@" \
      >> "$DIR/output.log" 2>&1 ) &
  FIT_PID=$!
  echo "$FIT_PID" > /tmp/fit_current.pid
  say "natural_0.004 launched pid=$FIT_PID"
}

touch "$DIR/output.log"
launch "$@"
STALE=${STALE:-2700}
while true; do
  sleep 60
  if ! kill -0 "$FIT_PID" 2>/dev/null; then
    wait "$FIT_PID" 2>/dev/null; rc=$?
    if [ -f "$DIR/results.json" ]; then
      say "natural_0.004 complete rc=$rc"
      break
    fi
    say "natural_0.004 died rc=$rc — resuming"
    sleep 20
    launch "$@"
    continue
  fi
  age=$(( $(date +%s) - $(stat -c %Y "$DIR/output.log") ))
  if [ "$age" -gt "$STALE" ]; then
    say "log stale ${age}s — killing pid $FIT_PID, resuming"
    kill -9 "$FIT_PID" 2>/dev/null
    sleep 10
    launch "$@"
  fi
done
git add "$DIR" 2>/dev/null && git diff --cached --quiet || \
  git commit -q -m "Natural-complexity quality anchor fit (lmbda=0.004, detail-0.25 GOP)"
say "natfit done"
