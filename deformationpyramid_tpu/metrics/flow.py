"""Scene-flow evaluation metrics.

Parity with reference ``scene_flow_metrics`` / ``compute_flow_metrics``
(``/root/reference/model/loss.py:382-471``): EPE3D, AccS, AccR, outlier in
percent, on the full cloud and on visible/occluded splits by overlap mask.
All functions are mask-aware so they can run jitted on padded clouds, with a
``psum``-friendly (sum, count) form for multi-chip aggregation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(x: Array, mask: Array | None) -> Array:
    if mask is None:
        return jnp.mean(x)
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def scene_flow_metrics(pred: Array, labels: Array, mask: Array | None = None,
                       strict: float = 0.025, relax: float = 0.05) -> dict[str, Array]:
    """pred/labels [N, 3] flows; returns EPE3D(x100=cm), AccS, AccR, outlier (%).

    Matches ``model/loss.py:382-403``: AccS/AccR accept absolute OR relative
    error under threshold; outlier is relative error > 0.3.
    """
    l2 = jnp.sqrt(jnp.sum((pred - labels) ** 2, axis=-1))
    lab = jnp.sqrt(jnp.sum(labels * labels, axis=-1))
    rel = l2 / (lab + 1e-20)
    return {
        "epe": _masked_mean(l2, mask) * 100.0,
        "AccS": _masked_mean(((l2 < strict) | (rel < strict)).astype(jnp.float32), mask) * 100.0,
        "AccR": _masked_mean(((l2 < relax) | (rel < relax)).astype(jnp.float32), mask) * 100.0,
        "outlier": _masked_mean((rel > 0.3).astype(jnp.float32), mask) * 100.0,
    }


def compute_flow_metrics(flow: Array, flow_gt: Array,
                         overlap: Array | None = None,
                         valid: Array | None = None) -> dict[str, Array]:
    """full / visible / occluded metric splits (``model/loss.py:431-471``)."""
    out = {f"full-{k}": v for k, v in scene_flow_metrics(flow, flow_gt, valid).items()}
    if overlap is not None:
        vis = overlap if valid is None else (overlap & valid)
        occ = (~overlap) if valid is None else ((~overlap) & valid)
        out.update({f"vis-{k}": v for k, v in scene_flow_metrics(flow, flow_gt, vis).items()})
        out.update({f"occ-{k}": v for k, v in scene_flow_metrics(flow, flow_gt, occ).items()})
    return out


def metric_sums(flow: Array, flow_gt: Array, mask: Array | None = None,
                strict: float = 0.025, relax: float = 0.05) -> dict[str, Array]:
    """(sum, count) form of the metrics for cross-device ``psum`` aggregation.

    Aggregate with ``jax.lax.psum`` over the data axis, then divide sums by
    counts on the host — the workload's only cross-device communication
    (SURVEY.md §2.4 mesh/runtime layer).
    """
    l2 = jnp.sqrt(jnp.sum((pred := flow - flow_gt) * pred, axis=-1))
    lab = jnp.sqrt(jnp.sum(flow_gt * flow_gt, axis=-1))
    rel = l2 / (lab + 1e-20)
    if mask is None:
        mask = jnp.ones(l2.shape, bool)
    w = mask.astype(jnp.float32)
    return {
        "epe_sum": jnp.sum(l2 * w),
        "accS_sum": jnp.sum(((l2 < strict) | (rel < strict)) * w),
        "accR_sum": jnp.sum(((l2 < relax) | (rel < relax)) * w),
        "outlier_sum": jnp.sum((rel > 0.3) * w),
        "count": jnp.sum(w),
    }
