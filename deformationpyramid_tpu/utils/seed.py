"""Deterministic seeding (reference ``utils/benchmark_utils.py:9-18``).

The reference seeds torch/cuda/numpy/random globally; in JAX randomness is
explicit, so this returns the root PRNG key and seeds numpy's global RNG for
host-side code that still uses it (sampling, augmentation fallbacks).
"""
from __future__ import annotations

import random

import numpy as np

import jax


def setup_seed(seed: int) -> jax.Array:
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.key(seed)
