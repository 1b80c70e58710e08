"""Bench-style run summaries for the suite drivers.

VERDICT r3 #8 (reporting hygiene): every sweep emits the same
``{best, median, spread, n}`` JSON shape ``bench.py`` does, so
best-observed numbers always travel with their median. Per-pair times are
the steady-state inter-harvest intervals of the pipelined driver — the
honest per-pair software cost under whatever tunnel conditions the run
saw (the r3 finding: harvest is flat ~40 ms; spread is dispatch-side
congestion).
"""
from __future__ import annotations

import json


def split_summary(metric: str, split: str, harvest_stamps: list[float],
                  n_done: int, total_s: float) -> str:
    """One JSON line summarizing a finished split sweep.

    ``harvest_stamps`` are perf_counter() values: the sweep start followed
    by one stamp per harvested pair.
    """
    diffs = sorted(b - a for a, b in zip(harvest_stamps, harvest_stamps[1:]))
    per_pair = {}
    if diffs:
        mid = len(diffs) // 2
        median = (diffs[mid] if len(diffs) % 2
                  else 0.5 * (diffs[mid - 1] + diffs[mid]))
        per_pair = {
            "best": round(diffs[0], 4),
            "median": round(median, 4),
            "spread": round(diffs[-1] - diffs[0], 4),
            "n": len(diffs),
        }
    return json.dumps({
        "metric": metric,
        "split": split,
        "pairs": n_done,
        "total_s": round(total_s, 2),
        "pairs_per_sec": round(n_done / total_s, 3) if total_s > 0 else None,
        "per_pair_s": per_pair,
    })
