#!/bin/bash
# Round-5 phase 6: one more bench_lndp rep set on a quiet box (the
# bench_lndp vs bench_lndp2 wall numbers moved 0.364 -> 0.242 pairs/s at
# near-identical dispatch averages — box-load noise; get a third sample),
# then a final bench.py cadence point at round HEAD.
# Chains behind scripts/onchip_r5_3dm2.sh (single chip).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r5
mkdir -p "$OUT"

for i in $(seq 1 720); do
  [ -f "$OUT/eval_3dmatch_c.ok" ] && break
  kill -0 "$(cat /tmp/r5_3dm2.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
echo "=== bench3 queue start $(date -u) ===" | tee -a "$OUT/coverage.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -f "$OUT/$name.ok" ]; then
    echo "=== $name SKIP (done) ===" | tee -a "$OUT/coverage.log"; return
  fi
  echo "=== $name start $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/coverage.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  [ $rc -eq 0 ] && touch "$OUT/$name.ok"
  echo "=== $name exit=$rc $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/coverage.log"
}

run bench_lndp3 5400 python bench_lndp.py
run bench_final 3600 python bench.py

echo "=== r5 bench3 queue done $(date -u) ===" | tee -a "$OUT/coverage.log"
