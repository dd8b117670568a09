#!/bin/bash
# Queued TPU probe (run by rd_r5_sequencer_v2.sh between fits): A/B the
# bidirectional decode kernel vs the mirror kernel on the real chip.
cd /root/repo
PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
  python scripts/probe_bidir_decode.py \
  > artifacts/perf_r5/bidir_ab.json 2> artifacts/perf_r5/bidir_ab.err
git add artifacts/perf_r5/bidir_ab.json artifacts/perf_r5/bidir_ab.err
git diff --cached --quiet || \
  git commit -q -m "A/B the bidirectional decode kernel on hardware"
