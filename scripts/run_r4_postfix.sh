#!/bin/bash
# Round-4 post-NaN-fix chip batch: A/B the r4 kernels (Pallas
# optimizer, Pallas LN backward, MHA backward rows, teacher block
# rows), re-capture the headline + int8 numbers, then rerun the
# evidence jobs (400-step convergence curves, int8 drift table).
#   bash scripts/run_r4_postfix.sh [OUT_DIR]
set -u
OUT=${1:-/tmp/r4_postfix}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name (timeout ${t}s): $*" | tee -a "$OUT/summary.log"
  BENCH_INIT_TIMEOUT_S=900 timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.log"
  grep -v WARNING "$OUT/$name.log" | tail -3 | tee -a "$OUT/summary.log"
  sleep 15  # tunnel settle time between processes
}

# headline + kernel A/Bs (each env combo is its own XLA program)
run bench_new 1500 python bench.py
run bench_opt_off 1500 env AUDIOSSL_FUSED_OPT=0 python bench.py
run bench_ln_off 1500 env AUDIOSSL_PALLAS_LN=0 python bench.py
run bench_mha_rows1 1500 env AUDIOSSL_MHA_ROWS=1 python bench.py
run bench_block_rows2 1500 env AUDIOSSL_BLOCK_ROWS=2 python bench.py
run bench_int8 1500 python bench.py --int8-teacher
# fresh breakdown with the new kernels
run profile_new 1800 python scripts/profile_step.py --batch 96
# evidence reruns (post-fix kernels, default envs)
run conv_frame 2400 python scripts/convergence_check.py --method frame \
    --steps 400 --batch 48 --out docs/convergence
run conv_clip 2400 python scripts/convergence_check.py --method clip \
    --steps 400 --batch 48 --out docs/convergence
run int8_drift 2400 python scripts/int8_drift.py --steps 200 \
    --out docs/artifacts

echo ALLDONE | tee -a "$OUT/summary.log"
