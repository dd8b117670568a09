#!/bin/bash
# Launch one flagship fit and babysit it: if the output log goes stale
# for STALE seconds (the axon tunnel occasionally drops an RPC response,
# leaving the client blocked forever in a futex wait), kill the fit and
# resume it from the newest checkpoint in the artifact dir.
#
# Usage: supervise_fit.sh <model_dir> <lmbda>
set -u
DIR=$1; LM=$2
# Stale threshold must exceed the longest LEGITIMATE silent span: a
# flagship resume spends ~25 min loading + uploading the GOP through
# the tunnel, then up to ~30 min in a remote compile of a new phase's
# program — neither writes the log (fit.py logs stage lines to shrink
# the silent spans, but a big remote compile is one blocking call).
# 1500 s killed healthy resumes in a loop (09:12-09:38 in
# artifacts/rd_r3/lmbda_0.004/output.log).
STALE=${STALE:-5400}
SEQLOG=/tmp/rd_seq.log

launch() {
  local resume=()
  local newest
  newest=$(ls -t "$DIR"/chkpnt*.pkl 2>/dev/null | head -1)
  if [ -n "${newest:-}" ]; then
    resume=(--checkpoint "$newest")
    echo "[supervise] $(date -u +%H:%M:%S) $DIR resume from $newest" \
      >> "$SEQLOG"
  fi
  # launch from a snapshot of the package: a supervisor relaunch that
  # races an in-progress builder edit must not import a half-edited
  # tree (05:33 crash: TypeError on a partially-landed field).  `python
  # -m` puts the CWD first on sys.path, so the snapshot only wins if we
  # ALSO cd out of /root/repo — hence the absolute paths.
  local dir_abs cfg_abs
  dir_abs=$(readlink -f "$DIR")
  # no rsync on this image — plain copy of the ~2 MB package
  mkdir -p /root/.fitsnap
  rm -rf /root/.fitsnap/gsvc_tpu /root/.fitsnap/cfgs
  cp -r /root/repo/gsvc_tpu /root/repo/cfgs /root/.fitsnap/
  find /root/.fitsnap -name __pycache__ -type d -exec rm -rf {} + \
    2>/dev/null || true
  cfg_abs=/root/.fitsnap/cfgs/cfg_20240919_8k.yaml
  # keep /root/.axon_site on PYTHONPATH: its sitecustomize.py registers
  # the axon TPU backend — replacing PYTHONPATH wholesale kills the chip
  ( cd /root/.fitsnap && \
    exec env PYTHONPATH=/root/.fitsnap:/root/.axon_site \
      python -m gsvc_tpu.cli.train \
    --source_path /root/data/gop600/frames \
    --optical_path /root/data/gop600/flow \
    --model_path "$dir_abs" \
    --config_path "$cfg_abs" \
    --lmbda "$LM" \
    --checkpoint_iterations 1000 2000 2500 3000 3500 4000 4500 5000 \
                            5500 6000 6500 7000 7500 \
    --lpips_weights proxy --seed 0 "${resume[@]}" \
    >> "$dir_abs/output.log" 2>&1 ) &
  FIT_PID=$!
  echo "$FIT_PID" > /tmp/fit_current.pid
}

mkdir -p "$DIR"
touch "$DIR/output.log"
# one-shot pre-fit hook: lets a builder session borrow the (otherwise
# back-to-back busy) TPU between lambda runs for bench/profile work.
# The hook file is consumed (renamed) so it runs at most once.
if [ -f /root/repo/scripts/prefit_hook.sh ]; then
  mv /root/repo/scripts/prefit_hook.sh /tmp/prefit_hook_running.sh
  echo "[supervise] $(date -u +%H:%M:%S) running pre-fit hook" >> "$SEQLOG"
  timeout 2400 bash /tmp/prefit_hook_running.sh >> /tmp/prefit_hook.log 2>&1
  echo "[supervise] $(date -u +%H:%M:%S) pre-fit hook done rc=$?" \
    >> "$SEQLOG"
fi
launch
while true; do
  sleep 60
  if ! kill -0 "$FIT_PID" 2>/dev/null; then
    wait "$FIT_PID" 2>/dev/null; rc=$?
    if [ -f "$DIR/results.json" ]; then
      echo "[supervise] $(date -u +%H:%M:%S) $DIR complete rc=$rc" \
        >> "$SEQLOG"
      exit 0
    fi
    echo "[supervise] $(date -u +%H:%M:%S) $DIR died rc=$rc — resuming" \
      >> "$SEQLOG"
    sleep 20
    launch
    continue
  fi
  age=$(( $(date +%s) - $(stat -c %Y "$DIR/output.log") ))
  if [ "$age" -gt "$STALE" ]; then
    echo "[supervise] $(date -u +%H:%M:%S) $DIR log stale ${age}s — " \
         "killing pid $FIT_PID and resuming from newest checkpoint" \
      >> "$SEQLOG"
    kill -9 "$FIT_PID" 2>/dev/null
    sleep 10
    launch
  fi
done
