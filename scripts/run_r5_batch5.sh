#!/usr/bin/env bash
# Round-5 batch 5: probe-gain A/B for the quantized recipe (waits for
# run_r5_batch4.sh).
set -u
OUT=/tmp/r5_batch
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

for i in $(seq 1 720); do
  grep -q "r5 batch4 complete" "$OUT/driver4.log" 2>/dev/null && break
  sleep 30
done

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  ( time timeout 2400 "$@" ) >"$OUT/$name.log" 2>&1
  echo "rc=$? (see $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | sed 's/^/    /'
}

run 40_probe_gain_int8dx  python scripts/probe_gain.py --steps 2000 --probe-every 400 --teacher-quant int8 --student-quant int8dx --out docs/convergence
echo "=== r5 batch5 complete ==="
