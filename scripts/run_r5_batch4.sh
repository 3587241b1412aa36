#!/usr/bin/env bash
# Round-5 batch 4: retry the tunnel-black-holed fused_opt A/B, then
# measure the int8dx (SwitchBack backward) student variant.
# Waits for run_r5_batch3.sh to finish.
set -u
OUT=/tmp/r5_batch
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

for i in $(seq 1 600); do
  grep -q "r5 batch3 complete" "$OUT/driver3.log" 2>/dev/null && break
  sleep 30
done

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  ( time timeout 2400 "$@" ) >"$OUT/$name.log" 2>&1
  echo "rc=$? (see $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | sed 's/^/    /'
}

run 30_fused_opt_retry    env AUDIOSSL_FUSED_OPT=1 python bench.py
run 31_int8dx             python bench.py --int8-teacher --int8dx-student
run 32_profile_int8dx     python scripts/profile_step.py --batch 96 --int8-teacher --int8dx-student
run 33_b128_int8dx        env AUDIOSSL_BENCH_BATCH=128 python bench.py --int8-teacher --int8dx-student
run 34_conv_int8dx        python scripts/convergence_check.py --method frame --steps 200 --teacher-quant int8 --student-quant int8dx --out docs/convergence
echo "=== r5 batch4 complete ==="
