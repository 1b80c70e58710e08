#!/bin/bash
# Round-5 on-chip eval queue (VERDICT r4 items 1, 2, 3, 4, 5, 6). Chained
# behind scripts/onchip_r5_train.sh — waits for the weight chain to finish
# (single chip: never two TPU jobs at once), then runs, in order:
#
#   parity_ours        16-pair x 16-seed fused ours cells (power fix, #3)
#   lndp_occ_4cm       headline reproduction with the retrained weights
#   lndp_occ_4cm_nn    NeCo-off control (same weights)
#   lndp_occ_oracle    GT-inlier-filter ceiling (#1a)
#   ndp_occ_trunc      truncated-chamfer NDP control, trunc=0.25 (#1b)
#   lndp_occ_timed     --stage-timers instrumented run (#2 breakdown, #5)
#   thr sweep          inlier_thr in {0.1 0.2 0.3 0.5 0.7} on val-occ (#6)
#   3dm chain          matcher+NeCo on rigid train-3dm, eval_3dmatch (#4)
#   bench_head         bench.py median-of-3 at r5 HEAD (doc cadence, #8)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r5
mkdir -p "$OUT"

# wait (up to 6 h) for the training chain's last artifact
for i in $(seq 1 720); do
  [ -f "$OUT/train_neco_occ_4cm.ok" ] && break
  if ! kill -0 "$(cat /tmp/r5_train.pid 2>/dev/null)" 2>/dev/null; then
    # trainer died without the .ok — stop rather than contend with nothing
    if [ ! -f "$OUT/train_neco_occ_4cm.ok" ]; then
      echo "=== train chain DEAD without final .ok — evals aborted ===" \
        | tee -a "$OUT/evals.log"
      exit 1
    fi
  fi
  sleep 30
done
if [ ! -f "$OUT/train_neco_occ_4cm.ok" ]; then
  echo "=== timed out waiting for training ===" | tee -a "$OUT/evals.log"
  exit 1
fi
echo "=== eval queue start $(date -u) ===" | tee -a "$OUT/evals.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -f "$OUT/$name.ok" ]; then
    echo "=== $name SKIP (done) ===" | tee -a "$OUT/evals.log"; return
  fi
  echo "=== $name start $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/evals.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  [ $rc -eq 0 ] && touch "$OUT/$name.ok"
  echo "=== $name exit=$rc $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/evals.log"
}

# --- #3 parity power: 16 pairs x 16 ours seeds on the fused path ---
run parity_ours 7200 env PARITY_PAIRS=16 PARITY_SEEDS=4 \
    PARITY_SEEDS_OURS=16 PARITY_FUSED=1 \
    python scripts/run_full_parity.py snapshot/full_parity_r5.jsonl ours

# --- headline reproduction + NeCo-off control (retrained weights) ---
run lndp_occ_4cm 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ_4cm.npz \
    --log-dir "$OUT/lndp_occ_4cm"
run lndp_occ_4cm_nn 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ_4cm.npz --no-reject-outliers \
    --log-dir "$OUT/lndp_occ_4cm_nn"

# --- #1a the outlier-rejection CEILING: GT-inlier filter ---
run lndp_occ_oracle 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ_4cm.npz --oracle-filter \
    --log-dir "$OUT/lndp_occ_oracle"

# --- #1b the skeptic's NDP control: truncated chamfer at the LNDP 0.25 ---
run ndp_occ_trunc 5400 python -m deformationpyramid_tpu.cli.eval_nolearned \
    --config config/NDP.yaml --splits 4DLoMatch-Occ --trunc-chamfer 0.25 \
    --log-dir "$OUT/ndp_occ_trunc"

# --- #2/#5 instrumented stage breakdown (matcher/NeCo/solve/metrics ms) ---
run lndp_occ_timed 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ --limit 40 \
    --weights snapshot/landmark_trained_occ_4cm.npz --stage-timers \
    --log-dir "$OUT/lndp_occ_timed"

# --- #6 confidence-threshold sweep on the held-out val-occ split ---
for thr in 0.1 0.2 0.3 0.5 0.7; do
  run "thr_$thr" 3600 python -m deformationpyramid_tpu.cli.eval_supervised \
      --config config/LNDP.yaml --splits val-occ --inlier-thr "$thr" \
      --weights snapshot/landmark_trained_occ_4cm.npz \
      --log-dir "$OUT/thr_$thr"
done

# --- #4 3DMatch end to end: rigid fine-tune + RANSAC recall eval ---
run train_matcher_3dm 7200 python -m deformationpyramid_tpu.cli.train_matcher \
    --config config/LNDP.yaml --split train-3dm --epochs 8 --lr 3e-5 \
    --resume-weights snapshot/matcher/matcher_best_loss.npz \
    --snapshot-dir snapshot/matcher_3dm
run train_neco_3dm 5400 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 8 --split train-3dm --no-augment \
    --matcher-weights snapshot/matcher_3dm/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained_3dm.npz \
    --snapshot-dir snapshot/neco_3dm
run eval_3dmatch 5400 python -m deformationpyramid_tpu.cli.eval_3dmatch \
    --config config/LNDP.yaml --weights snapshot/landmark_trained_3dm.npz \
    --log-dir "$OUT/threedmatch"

# --- #8 bench cadence at r5 HEAD ---
run bench_head 3600 python bench.py

echo "=== r5 eval queue done $(date -u) ===" | tee -a "$OUT/evals.log"
