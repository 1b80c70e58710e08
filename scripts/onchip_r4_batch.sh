#!/bin/bash
# Round-4 on-chip pipeline (VERDICT r3 items 1,2,3,4,6). Strictly
# sequential — one chip. Logs under snapshot/onchip_r4/. Order is
# highest-evidence-value first so a mid-batch interruption still leaves
# artifacts:
#
#   A. fused-path paired parity (ref rows reused from r3's ledger)
#   B. no-learned NDP baseline on the coherent-occlusion split
#   C. plain-suite matcher+NeCo training with UNCAPPED extraction
#      (recall no longer frozen at 256/|GT|) -> landmark_trained.npz
#   D. trained full-100-pair LNDP suite, 3 reps (throughput + score
#      artifact; per-pair {best,median,spread,n} via utils/reporting)
#   E. capped-256 vs uncapped LNDP A/B on the same 24 pairs
#   F. occlusion fine-tune (train-occ) -> landmark_trained_occ.npz,
#      then trained LNDP on 4DLoMatch-Occ with NeCo on vs off
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r4
mkdir -p "$OUT"

if ! timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "preflight FAILED: TPU backend not initializable ($(date -u))" \
    | tee -a "$OUT/batch.log"
  exit 1
fi
echo "preflight ok ($(date -u))" | tee -a "$OUT/batch.log"

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

# -- A: paired parity on the production fused path (VERDICT weak #1) --
# r3 ref rows are fusion-agnostic; only 32 fused ours cells run.
if [ ! -f snapshot/full_parity_r4.jsonl ]; then
  cp snapshot/full_parity_r3.jsonl snapshot/full_parity_r4.jsonl
fi
run parity_fused 5400 env PARITY_PAIRS=8 PARITY_SEEDS=4 PARITY_FUSED=1 \
    python scripts/run_full_parity.py snapshot/full_parity_r4.jsonl ours

# -- B: no-learned NDP on the coherent-occlusion split (baseline side) --
run ndp_occ 5400 python -m deformationpyramid_tpu.cli.eval_nolearned \
    --config config/NDP.yaml --splits 4DLoMatch-Occ --log-dir "$OUT/ndp_occ"
# and the uniform-dropout control at the same partial (r3 comparability)
run ndp_lo 5400 python -m deformationpyramid_tpu.cli.eval_nolearned \
    --config config/NDP.yaml --splits 4DLoMatch-F --log-dir "$OUT/ndp_lo"

# -- C: plain training with uncapped extraction (VERDICT missing #2) --
run train_matcher 10800 python -m deformationpyramid_tpu.cli.train_matcher \
    --config config/LNDP.yaml --epochs 20 --lr 1e-4
run train_neco 5400 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 8 \
    --matcher-weights snapshot/matcher/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained.npz

# -- D: trained LNDP full-suite artifact, 3 reps (VERDICT missing #4) --
for rep in 1 2 3; do
  run lndp_full_rep$rep 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
      --config config/LNDP.yaml --splits 4DMatch-F \
      --weights snapshot/landmark_trained.npz \
      --log-dir "$OUT/lndp_full_rep$rep"
done

# -- E: capped-256 vs uncapped A/B on the same 24 pairs (VERDICT #2b) --
run lndp_cap256 5400 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DMatch-F --limit 24 \
    --weights snapshot/landmark_trained.npz --max-matches 256 \
    --log-dir "$OUT/lndp_cap256"
run lndp_uncapped 5400 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DMatch-F --limit 24 \
    --weights snapshot/landmark_trained.npz \
    --log-dir "$OUT/lndp_uncapped"

# -- F: occlusion regime (VERDICT missing #1 + weak #4 / item 6) --
run finetune_occ 10800 python -m deformationpyramid_tpu.cli.train_matcher \
    --config config/LNDP.yaml --split train-occ --epochs 10 --lr 3e-5 \
    --resume-weights snapshot/matcher/matcher_best_loss.npz \
    --snapshot-dir snapshot/matcher_occ
run train_neco_occ 5400 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 8 --split train-occ \
    --matcher-weights snapshot/matcher_occ/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained_occ.npz \
    --snapshot-dir snapshot/neco_occ
run lndp_occ 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ.npz \
    --log-dir "$OUT/lndp_occ"
run lndp_occ_noneco 7200 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DLoMatch-Occ \
    --weights snapshot/landmark_trained_occ.npz --no-reject-outliers \
    --log-dir "$OUT/lndp_occ_noneco"

echo "=== batch done $(date -u) ===" | tee -a "$OUT/batch.log"
