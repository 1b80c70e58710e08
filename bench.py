"""Benchmark harness: registration throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: full reference NDP configuration (config/NDP.yaml: m=9, k0=-8,
depth=3, width=128, iters=500/level, lr=0.01, samples=2000, SE3+axis_angle,
early-stop 15@0.001) on synthetic deformable pairs — vs the reference's
strictly sequential per-pair PyTorch loop (eval_nolearned.py:70).

Batching strategy (measured, see docs/PERFORMANCE.md): per-iteration cost
is linear in the vmap width ALL THE WAY DOWN TO B=1 (the chip saturates on
a single pair's serial chain), so any batching only adds lockstep-tail
waste — the batched while_loop runs until the slowest pair in the chunk
converges. B=1 chunks streamed asynchronously are strictly best: measured
0.106 ms/iter and 8.37 pairs/s vs 0.377 ms/iter and 5.85 pairs/s at B=4
(round-2 A/B on the same chip).

Baseline: the NDP paper/reference reports ~1.5 s/pair on a desktop GPU
(sequential Adam loop with a host sync per iteration); BASELINE.md records no
in-repo numbers, so vs_baseline is computed against 1/1.5 = 0.67 pairs/s.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from deformationpyramid_tpu.data.synthetic import make_batch
from deformationpyramid_tpu.models.pyramid import NDPConfig
from deformationpyramid_tpu.solve.registration import SolverConfig, register_batch

BASELINE_PAIRS_PER_SEC = 1.0 / 1.5  # reference sequential loop, single GPU

import os

CFG = SolverConfig(
    pyramid=NDPConfig(m=9, k0=-8, depth=3, width=128,
                      rotation_format="axis_angle", motion="SE3"),
    iters=500, lr=0.01, max_break_count=15, break_threshold_ratio=0.001,
    samples=2000,
    use_fused=bool(int(os.environ.get("BENCH_FUSED_WARP", "0"))) or None,
    use_fused_chamfer=bool(int(os.environ.get("BENCH_FUSED_CD", "0"))) or None,
    transposed=(bool(int(os.environ["BENCH_TRANSPOSED"]))
                if "BENCH_TRANSPOSED" in os.environ else None),
    # Default ON for the benchmark config: same-session A/B measured
    # 7.93 pairs/s @ 0.094 ms/iter (fused) vs 7.56 @ 0.106 (unfused) —
    # docs/PERFORMANCE.md round-3. BENCH_FUSED_ITER=0 reverts.
    use_fused_iteration=bool(int(os.environ.get("BENCH_FUSED_ITER", "1")))
    or None,
)


def main_streaming(total: int = 16, n_slots: int = 4, n_points: int = 2000,
                   k_inner: int = 100) -> None:
    """Continuous-batching variant (solve/streaming.py): no lockstep tail."""
    from deformationpyramid_tpu.solve.streaming import register_stream

    srcs, tgts, _ = make_batch(total + n_slots, n=n_points, seed=0, deform=0.12)
    pairs = [(srcs[i], tgts[i]) for i in range(total + n_slots)]
    # warm-up/compile on the first n_slots pairs
    register_stream(pairs[:n_slots], CFG, n_slots=n_slots, k_inner=k_inner,
                    key=jax.random.key(0))
    t0 = time.perf_counter()
    register_stream(pairs[n_slots:], CFG, n_slots=n_slots, k_inner=k_inner,
                    key=jax.random.key(1))
    dt = time.perf_counter() - t0
    pairs_per_sec = total / dt
    print(json.dumps({
        "metric": "ndp_registration_throughput",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
    }))


def main(chunk: int = 1, total: int = 32, n_points: int = 2000,
         reps: int = 3) -> None:
    """Median-of-``reps`` measurement: the tunnel chip is SHARED and
    identical runs vary up to ~2x wall-clock (docs/PERFORMANCE.md caveat),
    so a single sample is meaningless round-over-round. The JSON line
    reports the median; per-rep samples + spread go to stderr."""
    import sys

    fn = jax.jit(lambda k, s, t: register_batch(k, s, t, CFG))

    # compile + warm-up (np.asarray forces a real device sync;
    # block_until_ready is not reliable on tunneled device buffers)
    srcs, tgts, _ = make_batch(chunk, n=n_points, seed=0, deform=0.12)
    keys = jax.random.split(jax.random.key(0), chunk)
    warped, _ = fn(keys, jnp.array(srcs), jnp.array(tgts))
    np.asarray(warped)

    # pre-stage all timed chunks on host so host-side generation is excluded
    chunks = []
    for c in range(total // chunk):
        s2, t2, _ = make_batch(chunk, n=n_points, seed=100 + c * chunk,
                               deform=0.12)
        chunks.append((jax.random.split(jax.random.key(10 + c), chunk),
                       jnp.array(s2), jnp.array(t2)))

    samples = []
    rep_iters = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(k, s, t) for (k, s, t) in chunks]  # async stream
        for w, _ in outs:
            np.asarray(w)
        dt = time.perf_counter() - t0
        samples.append(total / dt)
        # lockstep iterations actually executed = sum over chunks/levels of
        # the batch max, since converged pairs wait for the chunk's laggard
        rep_iters.append(sum(int(np.asarray(st["iters"]).max(axis=0).sum())
                             for _, st in outs))

    pairs_per_sec = float(np.median(samples))
    total_iters = rep_iters[int(np.argsort(samples)[len(samples) // 2])]
    dt_med = total / pairs_per_sec
    ms_per_iter = dt_med * 1e3 / max(total_iters, 1)
    # per-iteration useful FLOPs at B=chunk: MLP fwd+bwd (~3x fwd) +
    # dual-direction chamfer distance tiles
    n_pad = 2048
    w = CFG.pyramid.width
    mlp_fwd = n_pad * (6 * w + (CFG.pyramid.depth - 1) * w * w + w * 6) * 2
    cham = n_pad * n_pad * (3 + 4) * 2
    flops_per_iter = chunk * (3 * mlp_fwd + cham)
    mfu = flops_per_iter / (ms_per_iter * 1e-3) / 197e12  # v5e bf16 peak
    print(json.dumps({
        "ms_per_iteration": round(ms_per_iter, 4),
        "lockstep_iters": total_iters,
        "mfu_vs_v5e_peak": round(mfu, 5),
        "chunk": chunk,
        "samples_pairs_per_sec": [round(s, 3) for s in samples],
        "spread": round(max(samples) - min(samples), 3),
    }), file=sys.stderr)

    print(json.dumps({
        "metric": "ndp_registration_throughput",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    import sys

    from deformationpyramid_tpu.utils.compilation_cache import enable
    enable()

    if "--streaming" in sys.argv:
        main_streaming()
    else:
        main()
