#!/usr/bin/env bash
# Round-5 re-run, part 3 (launched manually after the main queue's
# probe-gain jobs; replaces run_r5_rerun2.sh and the dropped batch
# sweeps). The shape-corpus probe-gain runs use noise 1.2: the queued
# noise-3.0 int8dx run measured FLAT (0.05 init, 0.05-0.06 through
# step 800 — the comb class signal is unlearnable at ~-1.5 dB SNR in
# 2000 steps), so the gain measurement needs the milder corpus.
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

run 60_probe_gain_shape_bf16   python scripts/probe_gain.py --steps 2000 --probe-every 400 --noise 1.2 --classes 48 --out docs/convergence
run 63_probe_gain_shape_int8dx python scripts/probe_gain.py --steps 2000 --probe-every 400 --noise 1.2 --classes 48 --teacher-quant int8 --student-quant int8dx --out docs/convergence
run 61_bench_int8t_retry       python bench.py --int8-teacher
run 62_pallas_ln_ab            env AUDIOSSL_PALLAS_LN=1 python bench.py
echo "=== r5 rerun3 complete ==="
