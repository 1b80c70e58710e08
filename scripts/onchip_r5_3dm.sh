#!/bin/bash
# Round-5 phase 3: 3DMatch regime-matched fine-tune (the recall-0.65 fix).
# The first 3DMatch e2e (snapshot/onchip_r5/eval_3dmatch.log: recall 0.650,
# IR 0.120) fine-tuned the matcher on train-3dm — z-only rotations <=0.2 rad,
# single-sided crop — while the eval fragments carry arbitrary-axis 0.1-0.6
# rad rotations, DOUBLE-sided half-space crops, and 2 mm noise. Same lesson
# as the occ path: train at the eval regime. Chain:
#
#   ft_matcher_3dmb   matcher fine-tune on train-3dm-b (eval-regime fragments)
#   train_neco_3dmb   NeCo retrain on the disjoint train-3dm-c
#   eval_3dmatch_b    RANSAC recall A/B vs the 0.650 baseline
#
# Chains behind scripts/onchip_r5_coverage.sh (single chip).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r5
mkdir -p "$OUT"

# wait (up to 6 h) for the coverage queue's last artifact or its death
for i in $(seq 1 720); do
  [ -f "$OUT/lndp_occ_ft040_full.ok" ] && break
  kill -0 "$(cat /tmp/r5_coverage.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
echo "=== 3dm queue start $(date -u) ===" | tee -a "$OUT/coverage.log"

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

run ft_matcher_3dmb 10800 python -m deformationpyramid_tpu.cli.train_matcher \
    --config config/LNDP.yaml --split train-3dm-b --epochs 16 --lr 3e-5 \
    --resume-weights snapshot/matcher/matcher_best_loss.npz \
    --snapshot-dir snapshot/matcher_3dmb

run train_neco_3dmb 7200 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 8 --split train-3dm-c --no-augment \
    --matcher-weights snapshot/matcher_3dmb/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained_3dmb.npz \
    --snapshot-dir snapshot/neco_3dmb

run eval_3dmatch_b 5400 python -m deformationpyramid_tpu.cli.eval_3dmatch \
    --config config/LNDP.yaml --weights snapshot/landmark_trained_3dmb.npz \
    --log-dir "$OUT/threedmatch_b"

echo "=== r5 3dm queue done $(date -u) ===" | tee -a "$OUT/coverage.log"
