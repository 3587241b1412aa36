#!/usr/bin/env bash
# Round-5 re-run driver: the VM hosting the original batch-3..6 queue
# rebooted before results were committed (/tmp wiped). This re-runs the
# lost experiments in priority order on the one chip, strictly
# serialized. Most important first so a tunnel flake still leaves the
# headline numbers on disk.
set -u
OUT=/tmp/r5b
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  ( time timeout 2400 "$@" ) >"$OUT/$name.log" 2>&1
  echo "rc=$? (see $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | sed 's/^/    /'
}

# -- headline + quant variants ------------------------------------------
run 01_bench_bf16         python bench.py
run 02_bench_int8t        python bench.py --int8-teacher
run 03_bench_int8_full    python bench.py --int8-teacher --int8-student
run 04_bench_int8dx       python bench.py --int8-teacher --int8dx-student
run 05_fused_opt_retry    env AUDIOSSL_FUSED_OPT=1 python bench.py
# -- convergence A/Bs (200 real steps each) -----------------------------
run 10_conv_bf16          python scripts/convergence_check.py --method frame --steps 200 --out docs/convergence
run 11_conv_int8_full     python scripts/convergence_check.py --method frame --steps 200 --teacher-quant int8 --student-quant int8 --out docs/convergence
run 12_conv_int8dx        python scripts/convergence_check.py --method frame --steps 200 --teacher-quant int8 --student-quant int8dx --out docs/convergence
# -- profile the best quant variant -------------------------------------
run 20_profile_int8dx     python scripts/profile_step.py --batch 96 --int8-teacher --int8dx-student
# -- probe gain: pretraining -> downstream quality (hard corpus) --------
run 30_probe_gain_hard       python scripts/probe_gain.py --steps 2000 --probe-every 400 --noise 3.0 --classes 48 --out docs/convergence
run 31_probe_gain_hard_int8  python scripts/probe_gain.py --steps 2000 --probe-every 400 --noise 3.0 --classes 48 --teacher-quant int8 --student-quant int8dx --out docs/convergence
# -- batch sweeps on the quant recipes ----------------------------------
run 40_b112_int8t         env AUDIOSSL_BENCH_BATCH=112 python bench.py --int8-teacher
run 41_b112_int8dx        env AUDIOSSL_BENCH_BATCH=112 python bench.py --int8-teacher --int8dx-student
run 42_b128_int8dx        env AUDIOSSL_BENCH_BATCH=128 python bench.py --int8-teacher --int8dx-student
echo "=== r5 rerun complete ==="
