#!/usr/bin/env bash
# Round-5 on-chip measurement batch (run unattended, logs to /tmp/r5_batch).
#
# Covers the r4-verdict items that need chip time:
#   #1 fresh bf16 re-baseline after the fused-attention-block commits
#   #2 int8 re-measure + int8 step profile post-copy-fix
#   #4 loader-inclusive steady-state throughput (bench --e2e)
#   #5 device-staged serving metric (bench --embed / --embed-int8)
#   #6 probe-gain artifact (frozen-probe accuracy vs pretrain steps)
#   #7 pallas_opt / pallas_ln fate A/Bs now that boundary copies are gone
#   plus a batch-size sweep at 112/128 for bf16 and int8.
set -u
OUT=/tmp/r5_batch
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  ( time timeout 1800 "$@" ) >"$OUT/$name.log" 2>&1
  echo "rc=$? (see $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | sed 's/^/    /'
}

run 01_bf16_baseline      python bench.py
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
echo "=== r5 batch complete ==="
