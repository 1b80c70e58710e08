"""A/B the fused-iteration sweep kernel knobs on-chip.

Times kernel 1 (`ops/fused_iteration._fwd_sweep_call`: level warp +
dual argmin sweep) in a loop-carried fori per knob combo:

* mxu_dist — [tm,3] @ [3,N] bf16x3 matmul cross term vs ~7 VPU
  broadcast passes per distance tile;
* packed   — ops/knn-v3 one-integer-min selection vs the v1
  min + masked-iota-min pair per direction;
* tm       — y-tile height (fewer loop trips vs bigger temporaries).

Usage: python scripts/ab_fused_sweep.py [N] [ITERS]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from deformationpyramid_tpu.models.pyramid import (
    NDPConfig, init_pyramid_params, level_params,
)
from deformationpyramid_tpu.ops.fused_iteration import (
    _BIG, _fwd_sweep_call, _round_up, params_to_t,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 400

CFG = NDPConfig(m=9, k0=-8, depth=3, width=128,
                rotation_format="axis_angle", motion="SE3")


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((N, 3)) * 0.4, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((N, 3)) * 0.4, jnp.float32)
    params = init_pyramid_params(jax.random.key(0), CFG)
    p_t = params_to_t(level_params(params, 4))

    n_pad = _round_up(max(N, 128), 128)
    m_pad = _round_up(max(N, 512), 512)
    xt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :N].set(pts.T)
    xbig = jnp.where(jnp.arange(n_pad) < N, 0.0, _BIG)[None, :]
    yc = jnp.zeros((m_pad, 3), jnp.float32).at[:N].set(tgt)
    ysqb = jnp.where(jnp.arange(m_pad) < N,
                     jnp.sum(yc * yc, axis=-1), _BIG)[:, None]
    freq = jnp.exp2(jnp.float32(4) + 1.0 + CFG.k0).reshape(1, 1)

    # correctness vs the exact path
    ref = _fwd_sweep_call(freq, xt_pad, xbig, yc, ysqb, p_t,
                          mlp_scale=CFG.mlp_scale, tm=512, interpret=False,
                          mxu_dist=False, packed=False)
    ref_cidx = np.asarray(ref[2])[0, :N]
    ref_rarg = np.asarray(ref[4])[:N, 0]
    for mxu in (False, True):
        for packed in (False, True):
            o = _fwd_sweep_call(freq, xt_pad, xbig, yc, ysqb, p_t,
                                mlp_scale=CFG.mlp_scale, tm=512,
                                interpret=False, mxu_dist=mxu, packed=packed)
            fc = int((np.asarray(o[2])[0, :N] != ref_cidx).sum())
            fr = int((np.asarray(o[4])[:N, 0] != ref_rarg).sum())
            print(f"mxu={mxu} packed={packed}: idx flips x2y={fc} y2x={fr}")

    def make(mxu, packed, tm):
        @jax.jit
        def run(xt):
            def body(i, c):
                w, _, cidx, _, _ = _fwd_sweep_call(
                    freq, c, xbig, yc, ysqb, p_t, mlp_scale=CFG.mlp_scale,
                    tm=tm, interpret=False, mxu_dist=mxu, packed=packed)
                return c + 1e-12 * cidx.astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, xt)
        return run

    for mxu in (False, True):
        for packed in (False, True):
            for tm in (512, 1024):
                f = make(mxu, packed, tm)
                try:
                    np.asarray(f(xt_pad))  # compile + 1 run
                except Exception as e:
                    print(f"mxu={mxu} packed={packed} tm={tm}: FAILED "
                          f"({str(e)[:140]})", flush=True)
                    continue
                reps = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(f(xt_pad))
                    reps.append((time.perf_counter() - t0) / ITERS * 1e3)
                print(f"mxu={int(mxu)} packed={int(packed)} tm={tm}: "
                      f"{sorted(reps)[1]:.4f} ms/k1 "
                      f"(reps {' '.join(f'{r:.4f}' for r in reps)})",
                      flush=True)


if __name__ == "__main__":
    main()
