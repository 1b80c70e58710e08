#!/bin/bash
# Round-3 session-2 on-chip pipeline: the queued A/Bs from
# onchip_r3_batch.sh, PLUS the weight regeneration the wiped workspace
# needs before the LNDP steps can run (snapshot/ is gitignored, so
# landmark_trained.npz has to be retrained per docs/LEARNING.md).
# Strictly sequential — one chip. Logs under snapshot/onchip_r3/.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r3
mkdir -p "$OUT"

if ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "preflight FAILED: TPU backend not initializable ($(date -u))" \
    | tee -a "$OUT/batch.log"
  exit 1
fi
echo "preflight ok ($(date -u))" | tee -a "$OUT/batch.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/batch.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/batch.log"
}

# -- Part A: knob A/Bs + bench (no weights needed), highest value first --
run ab_fused_sweep   1800 python scripts/ab_fused_sweep.py 2000 400
run bench_fused      2400 env BENCH_FUSED_ITER=1 python bench.py
run ab_ldmk_iter     1800 python scripts/ab_ldmk_iteration.py 256 400
run ab_nsfp_iter     1800 python scripts/ab_nsfp_iteration.py 2000 400
run bench_unfused    2400 env BENCH_FUSED_ITER=0 python bench.py
run ablate_b1        2400 python scripts/ablate_iteration.py 1 400
run demo_fused       1800 env DP_FUSED_ITER=1 python -m deformationpyramid_tpu.cli.shape_transfer \
    -s /root/reference/sim3_demo/AlienSoldier.ply \
    -t /root/reference/sim3_demo/Ortiz.ply \
    -o "$OUT/warped_fused.ply" --samples 3000
run demo_unfused     1800 env DP_FUSED_ITER=0 python -m deformationpyramid_tpu.cli.shape_transfer \
    -s /root/reference/sim3_demo/AlienSoldier.ply \
    -t /root/reference/sim3_demo/Ortiz.ply \
    -o "$OUT/warped_unfused.ply" --samples 3000

# -- Part B: regenerate trained weights (docs/LEARNING.md pipeline) --
run train_matcher   10800 python -m deformationpyramid_tpu.cli.train_matcher \
    --config config/LNDP.yaml --epochs 20 --lr 1e-4
run train_neco       5400 python -m deformationpyramid_tpu.cli.train_neco \
    --config config/LNDP.yaml --epochs 8 \
    --matcher-weights snapshot/matcher/matcher_best_loss.npz \
    --save-landmark snapshot/landmark_trained.npz

# -- Part C: LNDP one-kernel landmark iteration A/B with trained weights --
run lndp_fused       3600 env DP_FUSED_ITER=1 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DMatch-F --limit 24 \
    --weights snapshot/landmark_trained.npz --log-dir "$OUT/lndp_fused"
run lndp_unfused     3600 env DP_FUSED_ITER=0 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DMatch-F --limit 24 \
    --weights snapshot/landmark_trained.npz --log-dir "$OUT/lndp_unfused"
echo "=== batch done ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/batch.log"
