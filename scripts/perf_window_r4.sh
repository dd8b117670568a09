#!/bin/bash
# Round-4 perf window: waits for the RD refit sweep to release the TPU,
# then collects the queued measurements in one sitting:
#   1. stage-isolation profile of the bench-shape step (device time)
#   2. MXU matmul dtype probe at the compositing shapes
#   3. bench.py A/B: float32 vs bf16x2 matmul_dtype
# Everything is timeout-bounded and logged under /tmp/perfwin/.
set -u
cd /root/repo
OUT=/tmp/perfwin
mkdir -p "$OUT"
say() { echo "[perfwin] $(date -u +%H:%M:%S) $*" >> "$OUT/log"; }

say "waiting for the refit sweep to finish"
while kill -0 "$(cat /tmp/refits.pid 2>/dev/null)" 2>/dev/null || \
      kill -0 "$(cat /tmp/fit_current.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
say "TPU free — starting measurements"

say "stage profile (f32)"
timeout 2400 python scripts/profile_step_stages.py \
  > "$OUT/stages_f32.json" 2> "$OUT/stages_f32.err"
say "stage profile rc=$?"

say "matmul dtype probe"
timeout 1800 python scripts/probe_matmul_dtype.py \
  > "$OUT/matmul_probe.json" 2> "$OUT/matmul_probe.err"
say "matmul probe rc=$?"

say "bench f32"
timeout 1800 python bench.py > "$OUT/bench_f32.json" 2> "$OUT/bench_f32.err"
say "bench f32 rc=$?"

say "bench bf16x2"
GSVC_MATMUL_DTYPE=bf16x2 timeout 2400 python bench.py \
  > "$OUT/bench_bf16x2.json" 2> "$OUT/bench_bf16x2.err"
say "bench bf16x2 rc=$?"

say "stage profile (bf16x2)"
GSVC_MATMUL_DTYPE=bf16x2 timeout 2400 python scripts/profile_step_stages.py \
  > "$OUT/stages_bf16x2.json" 2> "$OUT/stages_bf16x2.err"
say "stage profile bf16x2 rc=$?"

say "stream parity on hardware"
timeout 1800 python scripts/stream_parity_tpu.py \
  > "$OUT/stream_parity.json" 2> "$OUT/stream_parity.err"
say "stream parity rc=$? $(cat "$OUT/stream_parity.json" 2>/dev/null | tail -c 300)"

say "bench stream"
GSVC_RASTERIZER=pallas_stream timeout 2400 python bench.py \
  > "$OUT/bench_stream.json" 2> "$OUT/bench_stream.err"
say "bench stream rc=$?"

say "bench stream + bf16x2"
GSVC_RASTERIZER=pallas_stream GSVC_MATMUL_DTYPE=bf16x2 \
  timeout 2400 python bench.py \
  > "$OUT/bench_stream_bf16x2.json" 2> "$OUT/bench_stream_bf16x2.err"
say "bench stream+bf16x2 rc=$?"

say "flagship-shape step bench (stream plan)"
GSVC_FSB_PLAN=stream GSVC_RASTERIZER=pallas_stream \
  timeout 3000 python scripts/flagship_step_bench.py \
  > "$OUT/fsb_stream.json" 2> "$OUT/fsb_stream.err"
say "fsb stream rc=$?"

say "perf window done"
