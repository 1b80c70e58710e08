"""Persistent XLA compilation cache for all entry points.

The compiled solver is a scan-of-while_loop program that takes ~6 minutes
to compile per (shape, config) signature on the TPU; the 37M-param matcher
adds ~70 s per pyramid-shape signature. Measured on the axon tunnel: a
fresh process re-paid every one of these until the persistent cache was
enabled — with it, a second process's first solver call drops 360 s -> 62 s
(deserialize + load only). Every CLI, bench.py, and the driver entry call
:func:`enable` at startup.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    """Point jax at an on-disk compilation cache (idempotent).

    Honors ``JAX_COMPILATION_CACHE_DIR``; defaults to
    ``~/.cache/deformationpyramid_tpu/xla``. Safe to call before or after
    backend initialization (it only sets config values).
    """
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/deformationpyramid_tpu/xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # the default 2 GB floor would skip everything; these programs are small
    # on disk but minutes to build
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
