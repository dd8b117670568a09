#!/bin/bash
# Matched-protocol λ=0.004 point: continue the finished 8k flagship fit
# 1500 STE-entropy iterations under the SAME fine-tune config the
# bracket points (0.002 / 0.008) used, so all three curve points share
# one protocol (8000 base + 1500 ft) and the sweep is apples-to-apples
# (the 8k-only 0.004 point was dominated by its own finetuned brackets;
# aggregate_rd flagged monotone_psnr_in_bpp=false).
#
# Usage: rd_r4_ft004.sh    (waits for any current fit to release the TPU)
set -u
cd /root/repo
SEQLOG=/tmp/rd_seq.log
STALE=${STALE:-3600}
dir=artifacts/rd_r3/lmbda_0.004

say() { echo "[ft004] $(date -u +%H:%M:%S) $*" >> "$SEQLOG"; }

# wait for the TPU: any in-flight fit registers /tmp/fit_current.pid
while [ -n "$(cat /tmp/fit_current.pid 2>/dev/null)" ] && \
      kill -0 "$(cat /tmp/fit_current.pid)" 2>/dev/null; do
  sleep 30
done
say "TPU free; launching 0.004 matched-protocol finetune"

launch() {
  local dir_abs=$1
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
      --config_path /root/.fitsnap/cfgs/cfg_20240919_ft.yaml \
      --lmbda 0.004 \
      --checkpoint_iterations 8500 9000 \
      --eval_stride 2 \
      --lpips_weights proxy --seed 0 \
      --checkpoint "$(ls -t "$dir_abs"/chkpnt*.pkl | head -1)" \
      >> "$dir_abs/output.log" 2>&1 ) &
  FIT_PID=$!
  echo "$FIT_PID" > /tmp/fit_current.pid
  say "$dir_abs lm=0.004 ft launched pid=$FIT_PID"
}

launch "$(readlink -f "$dir")"
while true; do
  sleep 60
  if ! kill -0 "$FIT_PID" 2>/dev/null; then
    wait "$FIT_PID" 2>/dev/null; rc=$?
    # done = results.json newer than the launch-time checkpoint list
    if python - "$dir" <<'EOF'
import json, pathlib, sys
d = pathlib.Path(sys.argv[1])
r = d / "results.json"
sys.exit(0 if r.exists() and
         json.loads(r.read_text()).get("iterations", 0) > 8000 else 1)
EOF
    then
      say "$dir ft complete rc=$rc"
      break
    fi
    say "$dir ft died rc=$rc — resuming"
    sleep 20
    launch "$(readlink -f "$dir")"
    continue
  fi
  age=$(( $(date +%s) - $(stat -c %Y "$dir/output.log") ))
  if [ "$age" -gt "$STALE" ]; then
    say "$dir log stale ${age}s — killing pid $FIT_PID, resuming"
    kill -9 "$FIT_PID" 2>/dev/null
    sleep 10
    launch "$(readlink -f "$dir")"
  fi
done
say "0.004 ft done; aggregating"
python scripts/aggregate_rd.py artifacts/rd_r3 > /tmp/rd_aggregate.log 2>&1
say "aggregate rc=$? (see /tmp/rd_aggregate.log)"
