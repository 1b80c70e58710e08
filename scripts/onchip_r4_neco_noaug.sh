#!/bin/bash
# Round-4 follow-up #2: the fixed-label NeCo retrain STILL produced a
# no-op filter (occ A/B bit-identical; scripts/probe_neco_confidence.py
# shows conf ~0.43-0.52 constant, all above thr=0.3). Remaining root
# cause: NeCo trains on AUGMENTED (random-SO3-rotated) pairs, but this
# repo's matcher trains augment-free, so under rotation it emits 2-5%
# inliers (IR_neco train logs) — a distribution nothing like eval
# (IR 0.79-0.97 pre-filter). Retrain NeCo --no-augment on train-occ so
# the balanced BCE sees the eval distribution's real ~3-20% outliers,
# then re-run the occ-split NeCo on/off A/B.
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

run train_neco_occ_noaug 7200 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 16 --split train-occ --no-augment \
    --matcher-weights snapshot/matcher_occ/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained_occ_noaug.npz \
    --snapshot-dir snapshot/neco_occ_noaug

run lndp_occ_noaug 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ_noaug.npz \
    --log-dir "$OUT/lndp_occ_noaug"
run lndp_occ_noaug_noneco 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ_noaug.npz --no-reject-outliers \
    --log-dir "$OUT/lndp_occ_noaug_noneco"

# combined landmark+chamfer objective on the occ split (reference
# registration.py:187-203 supports loss_ldmk + w_cd*truncated-CD;
# config/LNDP.yaml ships w_cd=0 = landmarks only). Truncation 0.25
# bounds the occluded-region chamfer drag that sinks plain NDP here —
# does adding the visible-region chamfer term to the landmark anchors
# beat both pure modes?
run lndp_occ_wcd1 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ --w-cd 1.0 \
    --weights snapshot/landmark_trained_occ_noaug.npz \
    --log-dir "$OUT/lndp_occ_wcd1"

echo "=== neco_noaug batch done $(date -u) ===" | tee -a "$OUT/batch.log"
