#!/bin/bash
# Run every queued TPU experiment (docs/NEXT.md) unattended, each under
# a timeout so a black-holing axon tunnel can't wedge the batch.
# Results land in $OUT (default /tmp/tpu_experiments_<ts>).
#
#   bash scripts/run_queued_experiments.sh [OUT_DIR]
#
# Safe to re-run; each experiment overwrites its own log.
set -u
OUT=${1:-/tmp/tpu_experiments_$(date +%s)}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name (timeout ${t}s): $*" | tee -a "$OUT/summary.log"
  BENCH_INIT_TIMEOUT_S=300 timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}

# 1. re-baseline after the RRC fast path + fused AdamW/EMA
run bench_baseline 900 python bench.py
# 2. A/B the trainable fused-MLP path
run bench_fused_mlp_off 900 env AUDIOSSL_FUSED_MLP=0 python bench.py
# 3. int8 kernels: Mosaic lowering + speedup/error at ViT-base shapes
run kernel_microbench 900 python scripts/kernel_microbench.py
# 4. end-to-end quantized teacher recipe
run bench_int8_teacher 900 python bench.py --int8-teacher
# 5. serving-path metrics (bf16 + int8 extraction)
run bench_embed 900 python bench.py --embed --embed-int8
# 6. clip-small headline companion
run bench_clip 900 python bench.py --clip
# 7. fresh step profile at the bench batch
run profile_b96 1200 python scripts/profile_step.py --batch 96
# 8. batch sweep around the optimum
for B in 112 128; do
  run bench_b$B 900 env AUDIOSSL_BENCH_BATCH=$B python bench.py
done

echo; echo "all done -> $OUT/summary.log"
