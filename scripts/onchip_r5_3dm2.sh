#!/bin/bash
# Round-5 phase 5: 3DMatch follow-ups after the regime-matched A/B.
#   eval_3dmatch_b_nn   RANSAC-only control (--no-reject-outliers): the
#                       reference's 3DMatch protocol has no NeCo stage, and
#                       the 3dmb NeCo trained to only ~0.65 IR_neco — if
#                       filtering hurts recall here, the honest config is
#                       RANSAC-only for rigid fragments.
#   ft_matcher_3dmb2    16 more epochs (recall plateaued ~0.75 at epoch 15
#                       while loss still fell — check for headroom)
#   eval_3dmatch_c      recall A/B with the longer-trained matcher
#                       (RANSAC-only, so the matcher axis is isolated)
# Chains behind scripts/onchip_r5_bench2.sh (single chip).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r5
mkdir -p "$OUT"

for i in $(seq 1 720); do
  [ -f "$OUT/bench_lndp2.ok" ] && break
  kill -0 "$(cat /tmp/r5_bench2.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
echo "=== 3dm2 queue start $(date -u) ===" | tee -a "$OUT/coverage.log"

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

run eval_3dmatch_b_nn 5400 python -m deformationpyramid_tpu.cli.eval_3dmatch \
    --config config/LNDP.yaml --weights snapshot/landmark_trained_3dmb.npz \
    --no-reject-outliers --log-dir "$OUT/threedmatch_b_nn"

run ft_matcher_3dmb2 10800 python -m deformationpyramid_tpu.cli.train_matcher \
    --config config/LNDP.yaml --split train-3dm-b --epochs 16 --lr 3e-5 \
    --resume-weights snapshot/matcher_3dmb/matcher_best_loss.npz \
    --snapshot-dir snapshot/matcher_3dmb2

run combine_3dmb2 1200 python scripts/combine_landmark.py \
    snapshot/matcher_3dmb2/matcher_best_loss.npz \
    snapshot/landmark_trained_3dmb.npz \
    snapshot/landmark_3dmb2.npz

run eval_3dmatch_c 5400 python -m deformationpyramid_tpu.cli.eval_3dmatch \
    --config config/LNDP.yaml --weights snapshot/landmark_3dmb2.npz \
    --no-reject-outliers --log-dir "$OUT/threedmatch_c"

echo "=== r5 3dm2 queue done $(date -u) ===" | tee -a "$OUT/coverage.log"
