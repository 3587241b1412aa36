#!/usr/bin/env bash
# Round-5 re-run, part 2 (waits for run_r5_rerun.sh): retry the
# tunnel-black-holed int8-teacher bench, then the kernel-fate A/B the
# r4 verdict conditions on the boundary-copy fix — does the Pallas LN
# backward become net-positive once the residual stream is
# kernel-resident? (Its r4 measurement, -1.6%, predates the fused
# attention block kernel; with fused blocks ON the only standalone LNs
# left are the final encoder norm + fallback paths.)
set -u
OUT=/tmp/r5b
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

for i in $(seq 1 720); do
  grep -q "r5 rerun complete" /tmp/r5b_driver.log 2>/dev/null && break
  sleep 30
done

run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  ( time timeout 2400 "$@" ) >"$OUT/$name.log" 2>&1
  echo "rc=$? (see $OUT/$name.log)"
  tail -n 3 "$OUT/$name.log" | sed 's/^/    /'
}

run 50_bench_int8t_retry  python bench.py --int8-teacher
run 51_pallas_ln_retry    env AUDIOSSL_PALLAS_LN=1 python bench.py
echo "=== r5 rerun2 complete ==="
