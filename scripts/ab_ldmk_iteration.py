"""A/B the one-kernel fused landmark iteration on-chip.

Times one full pyramid-level solve in LNDP landmark mode (w_cd=0 —
``config/LNDP.yaml``: masked mean-squared landmark L2 over ~n_ldmk rows)
with early stop disabled (break_threshold_ratio=0) so both paths run
exactly ITERS iterations:

* fused   — ``ops/fused_iteration.run_fused_level_ldmk`` (forward warp +
  loss + early-stop decision + vjp + Adam in ONE Pallas launch/iter);
* unfused — ``solve/loop.run_adam_loop`` over the XLA level_warp chain
  (~25 dispatches/iter).

Usage: python scripts/ab_ldmk_iteration.py [N_LDMK] [ITERS]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from deformationpyramid_tpu.models.pyramid import (
    NDPConfig, init_pyramid_params, level_params, level_warp,
)
from deformationpyramid_tpu.ops.fused_iteration import run_fused_level_ldmk
from deformationpyramid_tpu.solve.loop import LoopConfig, run_adam_loop

N_LDMK = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 400

CFG = NDPConfig(m=10, k0=-8, depth=3, width=128,
                rotation_format="axis_angle", motion="SE3")


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((N_LDMK, 3)) * 0.4, jnp.float32)
    tgt = pts + jnp.asarray(rng.standard_normal((N_LDMK, 3)) * 0.05,
                            jnp.float32)
    valid = jnp.asarray(rng.random(N_LDMK) > 0.1)
    params = init_pyramid_params(jax.random.key(0), CFG)
    lvl_p = level_params(params, 4)
    # thr_ratio=0 + loss_eps=0 => never stops early; both paths run ITERS
    lcfg = LoopConfig(iters=ITERS, lr=0.01, max_break_count=10**9,
                      break_threshold_ratio=0.0, loss_eps=0.0)

    fused = jax.jit(lambda p: run_fused_level_ldmk(
        p, pts, valid, tgt, jnp.int32(4), CFG, lcfg))

    def loss_fn(p, it, key):
        w, _ = level_warp(p, pts, 4, CFG)
        sq = jnp.sum((w - tgt) ** 2, axis=-1)
        loss = jnp.sum(jnp.where(valid, sq, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1)
        return loss, w

    unfused = jax.jit(lambda p: run_adam_loop(loss_fn, p, lcfg,
                                              aux_init=pts))

    for name, fn in [("fused", fused), ("unfused", unfused)]:
        out = fn(lvl_p)                      # compile + correctness peek
        loss0 = float(np.asarray(out[2]["loss"]))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(lvl_p)
            np.asarray(out[2]["loss"])       # tunnel-safe sync
            reps.append(time.perf_counter() - t0)
        med = sorted(reps)[1]
        print(f"{name}: {med * 1e3 / ITERS:.4f} ms/iter "
              f"(median wall {med:.3f}s of {reps}, final loss {loss0:.6f})",
              flush=True)


if __name__ == "__main__":
    main()
