#!/bin/bash
# Round-5 post-queue chip jobs (VERDICT r4 weak #1 / next-round #2):
# the LNDP path's BENCH-style artifact plus the suite-level re-A/B of the
# one-kernel landmark iteration (parked in r3 on a B=1 micro A/B only —
# 0.0791 vs 0.0658 ms/iter — never examined at the real m=10 suite
# workload). Chains behind scripts/onchip_r5_evals.sh (single chip).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r5
mkdir -p "$OUT"

# wait (up to 9 h) for the eval queue's last artifact or its death
for i in $(seq 1 1080); do
  [ -f "$OUT/bench_head.ok" ] && break
  kill -0 "$(cat /tmp/r5_evals.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
echo "=== post queue start $(date -u) ===" | tee -a "$OUT/post.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -f "$OUT/$name.ok" ]; then
    echo "=== $name SKIP (done) ===" | tee -a "$OUT/post.log"; return
  fi
  echo "=== $name start $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/post.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  [ $rc -eq 0 ] && touch "$OUT/$name.ok"
  echo "=== $name exit=$rc $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/post.log"
}

# BENCH-style LNDP artifact (median-of-3, trained weights)
run bench_lndp 5400 python bench_lndp.py --reps 3

# suite-level A/B: one-kernel fused landmark iteration ON
run bench_lndp_fusedldmk 5400 env DP_FUSED_LDMK=1 \
    python bench_lndp.py --reps 3

echo "=== r5 post queue done $(date -u) ===" | tee -a "$OUT/post.log"
