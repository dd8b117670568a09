#!/bin/bash
# Manual endgame salvage for the realtex lmbda=0.004 fit (round 5).
# Replaces rd_r5_sequencer_v4.sh's deadline/salvage leg: the sequencer's
# 1800 s salvage timeout does not cover a cold re-upload (13 min) plus
# encode + strided eval (~12 min) after the night's tunnel-lease stalls,
# so the operator kills the sequencer + fit and runs this with no
# timeout.  Usage: rd_r5_salvage_manual.sh <ckpt.pkl>
set -u
cd /root/repo
CK="$1"
DIR="$(readlink -f artifacts/rd_r5/realtex_0.004)"
ITER=$(basename "$CK" | tr -dc 0-9)
echo "[salvage] from $CK (iter $ITER)" >> /tmp/rd5_salvage.log
( cd /root/.fitsnap && \
  exec env PYTHONPATH=/root/.fitsnap:/root/.axon_site \
    python -m gsvc_tpu.cli.train \
    --source_path /root/data/goptex/frames \
    --optical_path /root/data/goptex/flow \
    --config_path /root/.fitsnap/cfgs/cfg_20240919_8k.yaml \
    --eval_stride 2 --lpips_weights proxy --seed 0 \
    --model_path "$DIR" --lmbda 0.004 \
    --checkpoint "$CK" --set "optimization.iterations=$ITER" \
    >> "$DIR/output.log" 2>&1 )
rc=$?
echo "[salvage] train rc=$rc" >> /tmp/rd5_salvage.log
if [ -f "$DIR/results.json" ]; then
  git add "$DIR" && git commit -q -m \
    "Land realtex RD point lmbda=0.004 (salvaged at iter $ITER, eval_stride 2)"
  echo "[salvage] committed" >> /tmp/rd5_salvage.log
fi
