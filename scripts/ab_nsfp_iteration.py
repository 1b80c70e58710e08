"""A/B the fused NSFP iteration on-chip.

Times the NSFP (Neural Prior) solve with early stop disabled so both
paths run exactly ITERS iterations:

* fused   — ``ops/fused_iteration.run_fused_nsfp`` (two-kernel
  iteration: MLP-flow forward + dual sweep, then vjp + Adam);
* unfused — ``solve/baselines.optimize_nsfp``'s XLA loop.

Usage: python scripts/ab_nsfp_iteration.py [N] [ITERS]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from deformationpyramid_tpu.models.baselines import (
    NSFPConfig, init_nsfp_params, nsfp_flow,
)
from deformationpyramid_tpu.ops.chamfer import truncated_chamfer
from deformationpyramid_tpu.ops.fused_iteration import run_fused_nsfp
from deformationpyramid_tpu.solve.loop import LoopConfig, run_adam_loop

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 400

NCFG = NSFPConfig()  # reference width=128, 9 layers


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((N, 3)) * 0.4, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((N, 3)) * 0.4, jnp.float32)
    valid = jnp.ones((N,), bool)
    params = init_nsfp_params(jax.random.key(0), NCFG)
    lcfg = LoopConfig(iters=ITERS, lr=0.01, max_break_count=10**9,
                      break_threshold_ratio=0.0, loss_eps=0.0)

    fused = jax.jit(lambda p: run_fused_nsfp(p, pts, valid, tgt, valid,
                                             lcfg))

    def loss_fn(p, it, key):
        w = pts + nsfp_flow(p, pts, NCFG)
        return truncated_chamfer(w, tgt, trunc=1e9, use_pallas=None), None

    unfused = jax.jit(lambda p: run_adam_loop(loss_fn, p, lcfg))

    for name, fn in [("fused", fused), ("unfused", unfused)]:
        out = fn(params)
        stats = out[1] if name == "fused" else out[2]
        loss0 = float(np.asarray(stats["loss"]))
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(params)
            stats = out[1] if name == "fused" else out[2]
            np.asarray(stats["loss"])
            reps.append(time.perf_counter() - t0)
        med = sorted(reps)[1]
        print(f"{name}: {med * 1e3 / ITERS:.4f} ms/iter "
              f"(median wall {med:.3f}s of {reps}, final loss {loss0:.6f})",
              flush=True)


if __name__ == "__main__":
    main()
