#!/bin/bash
# Follow-up on-chip measurements, run after onchip_r3_session2.sh:
#   1. end-to-end bench A/B of the fused-sweep knobs (the fori-of-k1
#      harness hit tpu_compile_helper crashes on 3/4 variants —
#      bench.py through the full two-kernel fused iteration is the
#      decision criterion anyway)
#   2. 100-pair eval_nolearned --stream suite re-run at round-3 HEAD
#      (median-of-3): re-verifies the 8.9 pairs/s headline
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
OUT=snapshot/onchip_r3
mkdir -p "$OUT"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/batch.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%SZ) ===" | tee -a "$OUT/batch.log"
}

run bench_default2   2400 env BENCH_FUSED_ITER=1 python bench.py
run bench_packed     2400 env BENCH_FUSED_ITER=1 DP_SWEEP_PACKED=1 python bench.py
run bench_mxu        2400 env BENCH_FUSED_ITER=1 DP_SWEEP_MXU=1 python bench.py
run bench_mxu_packed 2400 env BENCH_FUSED_ITER=1 DP_SWEEP_MXU=1 DP_SWEEP_PACKED=1 python bench.py

# re-runs after the scoped-VMEM limit fix (all four earlier failures were
# Mosaic kernel-stack OOM at the default 16 MB cap; _compiler_params now
# raises it to 64 MB)
run ab_fused_sweep2  1800 python scripts/ab_fused_sweep.py 2000 400
run ab_nsfp_iter2    1800 python scripts/ab_nsfp_iteration.py 2000 400
run ablate_b1_2      2400 python scripts/ablate_iteration.py 1 400

# /verify surface 1 at HEAD: demo with the new auto-on-TPU fused default
run demo_head        1800 python -m deformationpyramid_tpu.cli.shape_transfer \
    -s /root/reference/sim3_demo/AlienSoldier.ply \
    -t /root/reference/sim3_demo/Ortiz.ply \
    -o "$OUT/warped_head.ply" --samples 3000

# suite writes to snapshot/pyramid_level/vis/ (config folder/exp_dir);
# stash each rep's log so the three timings stay distinguishable
for rep in 1 2 3; do
  run suite_rep$rep 3600 python -m deformationpyramid_tpu.cli.eval_nolearned \
      --config config/NDP.yaml --splits 4DMatch-F --stream
  cp snapshot/pyramid_level/vis/4DMatch-F.log "$OUT/suite_rep$rep.split.log" 2>/dev/null
done
# one dual-split rep: the low-overlap fabricated 4DLoMatch-F too
run suite_lo 3600 python -m deformationpyramid_tpu.cli.eval_nolearned \
    --config config/NDP.yaml --splits 4DLoMatch-F --stream
cp snapshot/pyramid_level/vis/4DLoMatch-F.log "$OUT/suite_lo.split.log" 2>/dev/null
echo "=== followup done ($(date -u +%H:%M:%SZ)) ===" | tee -a "$OUT/batch.log"
