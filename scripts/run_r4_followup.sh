#!/bin/bash
# Round-4 follow-up chip batch: A/B the NR-reciprocal erf kernels,
# retry the experiments the flaky tunnel dropped, and capture the
# int8 drift table + convergence curves.
#   bash scripts/run_r4_followup.sh [OUT_DIR]
set -u
OUT=${1:-/tmp/tpu_r4_followup}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name (timeout ${t}s): $*" | tee -a "$OUT/summary.log"
  BENCH_INIT_TIMEOUT_S=480 timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  sleep 20  # the tunnel needs settle time between processes
}

run kernel_microbench 900 python scripts/kernel_microbench.py
run bench_rcp 900 python bench.py
run bench_int8_teacher 900 python bench.py --int8-teacher
run bench_fused_mlp_off 900 env AUDIOSSL_FUSED_MLP=0 python bench.py
run bench_b112 900 env AUDIOSSL_BENCH_BATCH=112 python bench.py
run bench_embed 900 python bench.py --embed --embed-int8
run bench_prng_rbg 900 env AUDIOSSL_PRNG=rbg python bench.py
run int8_drift 1800 python scripts/int8_drift.py --steps 200 --out docs/artifacts
run conv_frame 1800 python scripts/convergence_check.py --method frame \
    --steps 400 --batch 48 --out docs/artifacts
run conv_clip 1800 python scripts/convergence_check.py --method clip \
    --steps 400 --batch 48 --out docs/artifacts

echo; echo "all done -> $OUT/summary.log"
