"""Named wall-clock timer registry (reference ``utils/tiktok.py:10-77``).

Same tic/toc API; on accelerators the toc path can block on async dispatch
so device work is actually attributed to the right region. For deep kernel
profiles use ``jax.profiler.trace`` via :func:`trace`.
"""
from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self, block_on=None):
        if block_on is not None:
            jax.block_until_ready(block_on)
        if self._t0 is None:
            return 0.0
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.count += 1
        self._t0 = None
        return dt

    @property
    def avg(self) -> float:
        return self.total / max(self.count, 1)


class Timers:
    """Registry of named timers; mirrors the reference's threading of one
    ``Timers`` object through the whole eval (``eval_nolearned.py:57,91-93``)."""

    def __init__(self):
        self.timers: dict[str, Timer] = {}

    def tic(self, name: str):
        self.timers.setdefault(name, Timer()).tic()

    def toc(self, name: str, block_on=None) -> float:
        return self.timers.setdefault(name, Timer()).toc(block_on)

    @contextlib.contextmanager
    def span(self, name: str, block_on_fn=None):
        self.tic(name)
        try:
            yield
        finally:
            self.toc(name, block_on=block_on_fn() if block_on_fn else None)

    def get_strings(self) -> list[str]:
        return [f"{k}: avg {v.avg * 1000:.2f} ms over {v.count} calls "
                f"(total {v.total:.3f} s)" for k, v in self.timers.items()]


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace for TPU timeline inspection."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
