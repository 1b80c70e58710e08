"""Benchmark harness: registration throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: full reference NDP configuration (config/NDP.yaml: m=9, k0=-8,
depth=3, width=128, iters=500/level, lr=0.01, samples=2000, SE3+axis_angle,
early-stop 15@0.001) on synthetic deformable pairs, batched via vmap so the
chip solves many pairs concurrently — vs the reference's strictly sequential
per-pair PyTorch loop (eval_nolearned.py:70).

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

CFG = SolverConfig(
    pyramid=NDPConfig(m=9, k0=-8, depth=3, width=128,
                      rotation_format="axis_angle", motion="SE3"),
    iters=500, lr=0.01, max_break_count=15, break_threshold_ratio=0.001,
    samples=2000,
)


def main(batch: int = 16, n_points: int = 2000) -> None:
    srcs, tgts, _ = make_batch(batch, n=n_points, seed=0, deform=0.12)
    keys = jax.random.split(jax.random.key(0), batch)

    fn = jax.jit(lambda k, s, t: register_batch(k, s, t, CFG))

    # compile + warm-up on one batch (np.asarray forces a real device sync;
    # block_until_ready is not reliable on tunneled device buffers)
    warped, stats = fn(keys, jnp.array(srcs), jnp.array(tgts))
    np.asarray(warped)

    # timed run on fresh data (new keys -> no caching of results)
    srcs2, tgts2, _ = make_batch(batch, n=n_points, seed=100, deform=0.12)
    keys2 = jax.random.split(jax.random.key(1), batch)
    t0 = time.perf_counter()
    warped, stats = fn(keys2, jnp.array(srcs2), jnp.array(tgts2))
    np.asarray(warped)
    dt = time.perf_counter() - t0

    pairs_per_sec = batch / dt
    print(json.dumps({
        "metric": "ndp_registration_throughput",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
