#!/bin/bash
# Round-5 phase 0: reproduce the round-4 weight chain (snapshot/ is
# gitignored, so the trained npz checkpoints do not survive a workspace
# wipe; make_suites.py regenerates the byte-identical splits and this
# script re-runs the exact r4 training commands — see
# scripts/onchip_r4_batch.sh (C, F) and onchip_r4_neco_4cm.sh).
#
#   1. train_matcher on `train` (20 epochs)     -> matcher/matcher_best_loss.npz
#   2. train_neco    on `train` (8 epochs)      -> landmark_trained.npz
#   3. matcher fine-tune on `train-occ` (10 ep) -> matcher_occ/matcher_best_loss.npz
#   4. NeCo 4cm on held-out `train-occ-b` (16 ep, --no-augment)
#                                               -> landmark_trained_occ_4cm.npz
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r5
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

run train_matcher 10800 python -m deformationpyramid_tpu.cli.train_matcher \
    --config config/LNDP.yaml --epochs 20 --lr 1e-4
run train_neco 5400 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 8 \
    --matcher-weights snapshot/matcher/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained.npz
run finetune_occ 10800 python -m deformationpyramid_tpu.cli.train_matcher \
    --config config/LNDP.yaml --split train-occ --epochs 10 --lr 3e-5 \
    --resume-weights snapshot/matcher/matcher_best_loss.npz \
    --snapshot-dir snapshot/matcher_occ
run train_neco_occ_4cm 7200 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 16 --split train-occ-b --no-augment \
    --matcher-weights snapshot/matcher_occ/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained_occ_4cm.npz \
    --snapshot-dir snapshot/neco_occ_4cm

echo "=== r5 train batch done $(date -u) ===" | tee -a "$OUT/batch.log"
