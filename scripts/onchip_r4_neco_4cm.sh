#!/bin/bash
# Round-4 follow-up #3: retrain NeCo with the FIXED 4 cm label threshold
# (match/losses.py neco_loss inlier_thr 0.1 -> 0.04, the reference's
# configs/train/4dmatch.yaml:28). At 0.1 the occ regime was single-class
# (pos_rate ~ 1 -> balanced-BCE gradient ~ 0 -> flat confidence, no-op
# filter in every A/B). With real two-class labels (occ eval pre-filter
# IR is 0.79-0.97 at 4 cm) the balanced BCE finally has signal.
# Keep --no-augment: the matcher trains augment-free, so rotated pairs
# are out-of-distribution for it (see onchip_r4_neco_noaug.sh header).
# Train on train-occ-b (fresh seeds at the eval regime): on train-occ the
# fine-tuned matcher memorizes its own split (pre-filter IR 0.996-0.998
# at 4 cm -> still single-class); held-out pairs give eval-like
# negatives.
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

run train_neco_occ_4cm 7200 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 16 --split train-occ-b --no-augment \
    --matcher-weights snapshot/matcher_occ/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained_occ_4cm.npz \
    --snapshot-dir snapshot/neco_occ_4cm

run lndp_occ_4cm 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ_4cm.npz \
    --log-dir "$OUT/lndp_occ_4cm"
run lndp_occ_4cm_noneco 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ_4cm.npz --no-reject-outliers \
    --log-dir "$OUT/lndp_occ_4cm_noneco"

echo "=== neco_4cm batch done $(date -u) ===" | tee -a "$OUT/batch.log"
