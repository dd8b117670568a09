#!/bin/bash
# Round-3 RD sweep sequencer: waits for the in-flight lambda=0.004 flagship
# fit, then runs lambda=0.008 and lambda=0.002 at the same 8k schedule.
# Single TPU chip => strictly sequential.
set -u
cd /root/repo

wait_pid() {
  local pid=$1
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
}

run_lambda() {
  local lm=$1
  local dir="artifacts/rd_r3/lmbda_${lm}"
  mkdir -p "$dir"
  echo "[sequencer] $(date -u +%H:%M:%S) launching lmbda=${lm}" >> /tmp/rd_seq.log
  python -m gsvc_tpu.cli.train \
    --source_path /root/data/gop600/frames \
    --optical_path /root/data/gop600/flow \
    --model_path "$dir" \
    --config_path cfgs/cfg_20240919_8k.yaml \
    --lmbda "$lm" \
    --checkpoint_iterations 2000 4000 6000 \
    --lpips_weights proxy --seed 0 \
    > "$dir/output.log" 2>&1
  echo "[sequencer] $(date -u +%H:%M:%S) lmbda=${lm} exited rc=$?" >> /tmp/rd_seq.log
}

# wait for the in-flight lambda=0.004 run.  NOTE: wait on the PYTHON
# process itself, not a wrapper shell pid that may already be gone —
# every pid in the file must be dead before we proceed.
if [ -f /tmp/fit004.pid ]; then
  for p in $(cat /tmp/fit004.pid); do
    wait_pid "$p"
  done
fi
echo "[sequencer] $(date -u +%H:%M:%S) lmbda=0.004 done" >> /tmp/rd_seq.log

run_lambda 0.008
run_lambda 0.002
echo "[sequencer] $(date -u +%H:%M:%S) sweep complete" >> /tmp/rd_seq.log
