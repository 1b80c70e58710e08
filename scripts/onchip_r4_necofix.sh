#!/bin/bash
# Round-4 follow-up: retrain NeCo with the FIXED train-time augmentation
# (data/fourdmatch.py _augment used to leave the flow stale with an
# inconsistent rot update, so every GT inlier label was garbage and NeCo
# learned a constant confidence — the "filtering is a no-op" finding).
# Re-runs both NeCo trainings and the occ-split NeCo on/off A/B, plus one
# plain-suite rep to confirm the plain regime stays neutral.
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

# plain-suite NeCo retrain (matcher unchanged: it trains augment-free)
run train_neco_fix 5400 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 8 \
    --matcher-weights snapshot/matcher/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained.npz \
    --snapshot-dir snapshot/neco_fix

# occ-regime NeCo retrain on the occ-finetuned matcher
run train_neco_occ_fix 5400 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 8 --split train-occ \
    --matcher-weights snapshot/matcher_occ/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained_occ.npz \
    --snapshot-dir snapshot/neco_occ_fix

# NeCo on/off A/B on the occlusion split with the fixed checkpoint
run lndp_occ_fix 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ.npz \
    --log-dir "$OUT/lndp_occ_fix"
run lndp_occ_noneco_fix 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ.npz --no-reject-outliers \
    --log-dir "$OUT/lndp_occ_noneco_fix"

# plain-suite confirmation rep (IR was already 0.998 pre-filter there; a
# working NeCo should be ~neutral — record it rather than assume it)
run lndp_full_fix 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DMatch-F \
    --weights snapshot/landmark_trained.npz \
    --log-dir "$OUT/lndp_full_fix"

echo "=== necofix batch done $(date -u) ===" | tee -a "$OUT/batch.log"
