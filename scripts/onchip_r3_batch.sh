#!/bin/bash
# Round-3 on-chip measurement batch — run once when the axon tunnel is
# back (single chip: steps run strictly sequentially). Logs everything
# under snapshot/onchip_r3/. Queued A/Bs (CLAUDE.md ledger):
#   1. fused-sweep kernel knobs (MXU distances / packed selection)
#   2. one-kernel landmark iteration vs unfused LNDP level loop
#   3. Sim3 shape-transfer demo through the fused path (validation)
#   4. bench.py fused vs unfused (median-of-3 each)
set -u
cd "$(dirname "$0")/.."
OUT=snapshot/onchip_r3
mkdir -p "$OUT"

# preflight: bail fast if the axon tunnel is still down (backend init
# hangs otherwise and every step would burn its full timeout)
if ! timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "preflight FAILED: TPU backend not initializable ($(date -u))" \
    | tee -a "$OUT/batch.log"
  exit 1
fi
echo "preflight ok: $(timeout 90 python -c 'import jax; print(jax.devices())' 2>/dev/null)" \
  | tee -a "$OUT/batch.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/batch.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "exit=$? ($name)" | tee -a "$OUT/batch.log"
  tail -20 "$OUT/$name.log"
}

# highest-value first in case the tunnel is only briefly up
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
# LNDP end-to-end with trained weights: one-kernel landmark solver A/B
run lndp_fused       3600 env DP_FUSED_ITER=1 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DMatch-F --limit 24 \
    --weights snapshot/landmark_trained.npz --log-dir "$OUT/lndp_fused"
run lndp_unfused     3600 env DP_FUSED_ITER=0 python -m deformationpyramid_tpu.cli.eval_supervised \
    --config config/LNDP.yaml --splits 4DMatch-F --limit 24 \
    --weights snapshot/landmark_trained.npz --log-dir "$OUT/lndp_unfused"
echo "=== batch done ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/batch.log"
