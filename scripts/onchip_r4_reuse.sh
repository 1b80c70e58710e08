#!/bin/bash
# Sweep-reuse on-chip A/B (VERDICT r3 #5): bench.py at DP_SWEEP_REUSE in
# {0, 2, 4, 8} (bench reports median-of-3 internally + lockstep_iters for
# iteration-inflation detection), then a 100-pair 4DMatch-F suite rep at
# the best T for EPE parity vs the exact-sweep suite numbers.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r4
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -f "$OUT/$name.ok" ]; then
    echo "=== $name SKIP (done) ===" | tee -a "$OUT/batch.log"; return
  fi
  echo "=== $name start $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/batch.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  [ $rc -eq 0 ] && touch "$OUT/$name.ok"
  echo "=== $name exit=$rc $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/batch.log"
}

run bench_reuse0 2400 env DP_SWEEP_REUSE=0 python bench.py
run bench_reuse2 2400 env DP_SWEEP_REUSE=2 python bench.py
run bench_reuse4 2400 env DP_SWEEP_REUSE=4 python bench.py
run bench_reuse8 2400 env DP_SWEEP_REUSE=8 python bench.py

# EPE parity at the suite level: pick the winner manually after reading
# the bench logs, default T=4 here (edit + rerun if another T wins).
T=${REUSE_T:-4}
run ndp_suite_reuse 5400 env DP_SWEEP_REUSE=$T \
    python -m deformationpyramid_tpu.cli.eval_nolearned \
    --config config/NDP.yaml --splits 4DMatch-F \
    --log-dir "$OUT/ndp_suite_reuse"

echo "=== reuse A/B done $(date -u) ===" | tee -a "$OUT/batch.log"
