#!/bin/bash
# Round-5 phase 2: the coverage-bound attack (VERDICT r4 #1c + weak #4).
# The oracle decomposition (snapshot/onchip_r5/lndp_occ_oracle: 3.05 cm
# full-EPE with a GT-inlier filter vs NeCo's 5.28) splits the occ residual
# into ~2.2 cm NeCo headroom and a ~3.0 cm coverage floor set by the
# matcher (IR_pre 0.900, NRFMR 0.516 at eval regime partial=0.40 while the
# r4 fine-tune ran at 0.55). Attack both:
#
#   ft_matcher_040      matcher fine-tune at the EVAL regime (train-occ-c,
#                       partial 0.40 coherent, 32 pairs, 16 epochs)
#   combine_040         new matcher + OLD NeCo head (NeCo consumes only 6D
#                       match coordinates -> the matcher axis isolated)
#   lndp_occ_ft040      occ suite A/B vs the 5.28 headline
#   train_neco_040      NeCo retrained on held-out train-occ-b under the
#                       new matcher (both axes)
#   lndp_occ_ft040_full occ suite with the fully retrained stack
#
# Chains behind scripts/onchip_r5_post.sh (single chip).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r5
mkdir -p "$OUT"

# wait (up to 6 h) for the post queue's last artifact or its death
for i in $(seq 1 720); do
  [ -f "$OUT/bench_lndp_fusedldmk.ok" ] && break
  kill -0 "$(cat /tmp/r5_post.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done
echo "=== coverage queue start $(date -u) ===" | tee -a "$OUT/coverage.log"

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

run ft_matcher_040 10800 python -m deformationpyramid_tpu.cli.train_matcher \
    --config config/LNDP.yaml --split train-occ-c --epochs 16 --lr 3e-5 \
    --resume-weights snapshot/matcher/matcher_best_loss.npz \
    --snapshot-dir snapshot/matcher_occ040

run combine_040 1200 python scripts/combine_landmark.py \
    snapshot/matcher_occ040/matcher_best_loss.npz \
    snapshot/landmark_trained_occ_4cm.npz \
    snapshot/landmark_occ040_oldneco.npz

run lndp_occ_ft040 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_occ040_oldneco.npz \
    --log-dir "$OUT/lndp_occ_ft040"

run train_neco_040 7200 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 16 --split train-occ-b --no-augment \
    --matcher-weights snapshot/matcher_occ040/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained_occ040.npz \
    --snapshot-dir snapshot/neco_occ040

run lndp_occ_ft040_full 7200 \
    python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ040.npz \
    --log-dir "$OUT/lndp_occ_ft040_full"

echo "=== r5 coverage queue done $(date -u) ===" | tee -a "$OUT/coverage.log"
