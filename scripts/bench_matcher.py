"""On-chip LNDP matcher inference benchmark (VERDICT r1 item 7).

Times the full Lepard matcher forward (KPFCN gathers -> repositioning
transformer -> matching -> soft procrustes) and the landmark inference
(matcher + NeCo) at the reference scale: feature_dim 528, coarse level
~1-2k points, on whatever backend is active (TPU via axon by default).

Usage: python scripts/bench_matcher.py [n_points] [repeats]
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from deformationpyramid_tpu.data.collate import (  # noqa: E402
    build_pair_pyramid, calibrate_neighborhood_limits,
)
from deformationpyramid_tpu.data.synthetic import make_pair  # noqa: E402
from deformationpyramid_tpu.match.backbone import KPFCN_ARCHITECTURE  # noqa: E402
from deformationpyramid_tpu.match.config_loader import (  # noqa: E402
    landmark_config_from_yaml,
)
from deformationpyramid_tpu.match.landmark import (  # noqa: E402
    init_landmark_model, landmark_inference,
)
from deformationpyramid_tpu.match.pipeline import apply_matcher  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def main():
    lcfg = landmark_config_from_yaml("config/configs/correspondence.yaml")
    src, tgt, _ = make_pair(n=N, seed=0, deform=0.08)
    t0 = time.perf_counter()
    limits = calibrate_neighborhood_limits([(src, tgt)], lcfg.matcher.kpfcn,
                                           KPFCN_ARCHITECTURE)
    pyr = build_pair_pyramid(src, tgt, lcfg.matcher.kpfcn,
                             KPFCN_ARCHITECTURE, limits)
    t_collate = time.perf_counter() - t0
    cl = lcfg.matcher.coarse_level
    n_c = len(pyr.points[cl])
    print(f"fine stacked {len(pyr.points[0])} pts, coarse {n_c} "
          f"(src {pyr.src_lengths[cl]} / tgt {pyr.tgt_lengths[cl]}), "
          f"host collate {t_collate:.2f}s")

    pyrd = {"points": [jnp.array(p) for p in pyr.points],
            "valids": [jnp.array(v) for v in pyr.valids],
            "neighbors": [jnp.array(x) for x in pyr.neighbors],
            "pools": [jnp.array(x) for x in pyr.pools],
            "upsamples": [jnp.array(x) for x in pyr.upsamples],
            "features": jnp.array(pyr.features)}
    sl = jnp.int32(pyr.src_lengths[cl])
    tl = jnp.int32(pyr.tgt_lengths[cl])
    params = init_landmark_model(jax.random.key(0), lcfg)

    # static per-cloud coarse caps (see cli/eval_supervised.py): without
    # them both clouds pad to the full stacked coarse size and every
    # [S, T] object (transformer attention, conf matrix, procrustes top-k)
    # is ~4x oversized
    def bucket(n, minimum=256):
        import math
        if n <= minimum:
            return minimum
        k = int(math.floor(math.log2(n / minimum)))
        base = minimum << k
        step = base // 4
        return min(base * 2, base + step * int(math.ceil((n - base) / step)))

    s_cap = bucket(int(pyr.src_lengths[cl]))
    t_cap = bucket(int(pyr.tgt_lengths[cl]))

    match_jit = jax.jit(lambda p, pyr, sl, tl: apply_matcher(
        p, pyr, sl, tl, lcfg.matcher, s_cap=s_cap, t_cap=t_cap))
    ldmk_jit = jax.jit(lambda p, pyr, sl, tl: landmark_inference(
        p, pyr, sl, tl, lcfg, s_cap=s_cap, t_cap=t_cap))

    for name, fn, arg in (("matcher", match_jit, params["matcher"]),
                          ("landmark(matcher+NeCo)", ldmk_jit, params)):
        t0 = time.perf_counter()
        out = fn(arg, pyrd, sl, tl)
        np.asarray(jax.tree.leaves(out)[0])
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            out = fn(arg, pyrd, sl, tl)
        np.asarray(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / REPEATS
        print(f"{name}: {dt * 1e3:.2f} ms/pair ({1.0 / dt:.2f} pairs/s) "
              f"[compile {t_compile:.1f}s] backend={jax.default_backend()} "
              f"caps=({s_cap},{t_cap})")

    # steady-state device time: fori loop with the carry fed into the
    # INPUT features so XLA cannot hoist the loop-invariant forward
    # (per-dispatch numbers above include the tunnel's per-call overhead)
    @jax.jit
    def steady(p, pyr, sl, tl):
        def body(i, c):
            pyr2 = dict(pyr)
            pyr2["features"] = pyr["features"] + c * 1e-30
            out = apply_matcher(p, pyr2, sl, tl, lcfg.matcher,
                                s_cap=s_cap, t_cap=t_cap)
            return c + 1e-9 * out["R_s2t_pred"][0, 0]
        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0))

    np.asarray(steady(params["matcher"], pyrd, sl, tl))
    t0 = time.perf_counter()
    np.asarray(steady(params["matcher"], pyrd, sl, tl))
    dt = (time.perf_counter() - t0) / REPEATS
    print(f"matcher steady-state (on-chip): {dt * 1e3:.2f} ms/pair "
          f"({1.0 / dt:.2f} pairs/s)")


if __name__ == "__main__":
    main()
