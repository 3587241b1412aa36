#!/usr/bin/env bash
# Round-5 on-chip measurement batch, continuation (step 01 bf16 baseline is
# already captured: 369.47 clips/s, 2.566x — /tmp/r5_batch/01_bf16_baseline.log).
# Runs detached; logs to /tmp/r5_batch. Serialize: one chip, one job at a time.
set -u
OUT=/tmp/r5_batch
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  ( time timeout 2400 "$@" ) >"$OUT/$name.log" 2>&1
  echo "rc=$? (see $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | sed 's/^/    /'
}

run 02_int8               python bench.py --int8-teacher
run 03_profile_int8       python scripts/profile_step.py --batch 96 --int8-teacher
run 04_e2e                python bench.py --e2e
run 05_embed              python bench.py --embed --embed-int8
run 06_fused_opt          env AUDIOSSL_FUSED_OPT=1 python bench.py
run 07_pallas_ln          env AUDIOSSL_PALLAS_LN=1 python bench.py
run 08_b112               env AUDIOSSL_BENCH_BATCH=112 python bench.py
run 09_b128               env AUDIOSSL_BENCH_BATCH=128 python bench.py
run 10_b112_int8          env AUDIOSSL_BENCH_BATCH=112 python bench.py --int8-teacher
run 11_b128_int8          env AUDIOSSL_BENCH_BATCH=128 python bench.py --int8-teacher
run 12_probe_gain         python scripts/probe_gain.py --steps 2000 --probe-every 400 --out docs/convergence
run 13_conv_int8_ab       python scripts/convergence_check.py --method frame --steps 200 --teacher-quant int8 --out docs/convergence
echo "=== r5 batch complete ==="
