#!/usr/bin/env bash
# Round-5 follow-up: int8 STUDENT-forward measurements (waits for
# run_r5_batch2.sh to finish — one chip, strictly serialized).
set -u
OUT=/tmp/r5_batch
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# wait for the first batch to drain (sentinel in its driver log)
for i in $(seq 1 480); do
  grep -q "r5 batch complete" "$OUT/driver.log" 2>/dev/null && break
  sleep 30
done

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  ( time timeout 2400 "$@" ) >"$OUT/$name.log" 2>&1
  echo "rc=$? (see $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | sed 's/^/    /'
}

run 20_int8_full          python bench.py --int8-teacher --int8-student
run 21_int8_stu_only      python bench.py --int8-student
run 22_profile_int8_full  python scripts/profile_step.py --batch 96 --int8-teacher --int8-student
run 23_b112_int8_full     env AUDIOSSL_BENCH_BATCH=112 python bench.py --int8-teacher --int8-student
run 24_b128_int8_full     env AUDIOSSL_BENCH_BATCH=128 python bench.py --int8-teacher --int8-student
run 25_conv_bf16          python scripts/convergence_check.py --method frame --steps 200 --out docs/convergence
run 26_conv_int8_full     python scripts/convergence_check.py --method frame --steps 200 --teacher-quant int8 --student-quant int8 --out docs/convergence
echo "=== r5 batch3 complete ==="
