#!/usr/bin/env bash
# Round-5 batch 6: probe_gain re-runs on a HARDER corpus (the default
# noise saturates the ridge probe at random init for ViT-small — acc
# 1.0 at step 0 gives the gain measurement no headroom), bf16 vs the
# int8 recipe, plus the tunnel-lost b112 int8 retry.
# Waits for run_r5_batch5.sh.
set -u
OUT=/tmp/r5_batch
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

for i in $(seq 1 720); do
  grep -q "r5 batch5 complete" "$OUT/driver5.log" 2>/dev/null && break
  sleep 30
done

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  ( time timeout 2400 "$@" ) >"$OUT/$name.log" 2>&1
  echo "rc=$? (see $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | sed 's/^/    /'
}

run 50_probe_gain_hard       python scripts/probe_gain.py --steps 2000 --probe-every 400 --noise 3.0 --classes 48 --out docs/convergence
run 51_probe_gain_hard_int8  python scripts/probe_gain.py --steps 2000 --probe-every 400 --noise 3.0 --classes 48 --teacher-quant int8 --student-quant int8dx --out docs/convergence
run 52_b112_int8_retry       env AUDIOSSL_BENCH_BATCH=112 python bench.py --int8-teacher
echo "=== r5 batch6 complete ==="
