#!/bin/bash
# Round-5 phase 7: at-HEAD cadence reps now the chip is idle.
#   ndp_suite_rep    100-pair 4DMatch-F eval_nolearned sweep (r4 cadence)
#   lndp_full_rep    100-pair eval_supervised with the trained weights
#   sim3_demo        shape-transfer CLI drive (verify surface 1)
# Chains behind scripts/onchip_r5_bench3.sh (single chip).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r5
mkdir -p "$OUT"

for i in $(seq 1 720); do
  [ -f "$OUT/bench_final.ok" ] && break
  kill -0 "$(cat /tmp/r5_bench3.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
echo "=== final queue start $(date -u) ===" | tee -a "$OUT/coverage.log"

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

run ndp_suite_rep 5400 python -m deformationpyramid_tpu.cli.eval_nolearned \
    --config config/NDP.yaml --splits 4DMatch-F \
    --log-dir "$OUT/ndp_suite_rep"

run lndp_full_rep 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DMatch-F \
    --weights snapshot/landmark_trained.npz \
    --log-dir "$OUT/lndp_full_rep"

run sim3_demo 3600 python -m deformationpyramid_tpu.cli.shape_transfer \
    -s /root/reference/sim3_demo/AlienSoldier.ply \
    -t /root/reference/sim3_demo/Ortiz.ply \
    -o /tmp/warped_r5.ply --samples 3000

echo "=== r5 final queue done $(date -u) ===" | tee -a "$OUT/coverage.log"
