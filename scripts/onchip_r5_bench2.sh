#!/bin/bash
# Round-5 phase 4: re-bench the LNDP eval path after the harvest fast path
# (jitted IR/NRFMR + shared per-pair flow-interp cKDTree) — A/B against
# snapshot/onchip_r5/bench_lndp.log (0.364 pairs/s, per_pair_best 0.2031 s).
# Chains behind scripts/onchip_r5_3dm.sh (single chip).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r5
mkdir -p "$OUT"

for i in $(seq 1 720); do
  [ -f "$OUT/eval_3dmatch_b.ok" ] && break
  kill -0 "$(cat /tmp/r5_3dm.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
echo "=== bench2 queue start $(date -u) ===" | tee -a "$OUT/coverage.log"

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

run bench_lndp2 5400 python bench_lndp.py

echo "=== r5 bench2 queue done $(date -u) ===" | tee -a "$OUT/coverage.log"
