"""Matcher evaluation metrics: Inlier Ratio and NRFMR.

Reference parity: IR (``outlier_rejection/loss.py:30-60,162-190``) and
NRFMR — non-rigid feature matching recall — (``correspondence/lib/tester.py:35-95``):
for each GT-correspondence source point, blend the flow predicted by the k
nearest matched source landmarks (inverse-distance weights) and count it
recalled if the blended flow lands within ``recall_thr`` of the GT.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def inlier_ratio(ldmk_s: Array, ldmk_t: Array, valid: Array,
                 gt_rot: Array, gt_trn: Array, s2t_flow_at_ldmk: Array,
                 thr: float = 0.04) -> Array:
    """Fraction of landmark pairs within thr of the GT-warped source."""
    warped = (gt_rot @ (ldmk_s + s2t_flow_at_ldmk).T + gt_trn).T
    d2 = jnp.sum((warped - ldmk_t) ** 2, axis=1)
    ok = (d2 < thr ** 2) & valid
    return jnp.sum(ok) / jnp.maximum(jnp.sum(valid), 1)


def nrfmr(ldmk_s: Array, ldmk_t: Array, ldmk_valid: Array,
          metric_pts: Array, metric_flow_gt: Array,
          knn: int = 3, recall_thr: float = 0.04,
          search_radius: float = 0.1,
          metric_valid: Array | None = None) -> Array:
    """Non-rigid feature matching recall over metric points.

    ldmk_s/ldmk_t [K, 3] padded matched landmarks; metric_pts [M, 3] GT
    sample points on the source; metric_flow_gt [M, 3] their GT flow.
    Predicted flow at each metric point = IDW blend of the k nearest
    landmarks' flows (``lib/tester.py:12-33`` blend_anchor_motion), with the
    reference's ``search_radius`` gating: anchors farther than the radius
    get their (euclidean) distance pushed to 1e10 BEFORE inverse-distance
    weighting, so a far landmark contributes ~0 weight — unless ALL k
    anchors are out of radius, in which case the weights degenerate to
    uniform 1/k (that quirk is load-bearing: ``compute_nrfmr`` ignores the
    returned valid_mask, ``lib/tester.py:66-95``, so out-of-range points
    still count in the recall denominator with the uniform blend).

    ``metric_valid`` [M] (optional) marks padding rows to ignore — it lets
    callers pad ``metric_pts`` to a shape bucket so a jitted nrfmr compiles
    once per bucket instead of once per pair (eval-harvest fast path); the
    recall denominator becomes the count of REAL metric points.
    """
    ldmk_flow = ldmk_t - ldmk_s
    d2 = jnp.sum((metric_pts[:, None] - ldmk_s[None]) ** 2, axis=-1)
    d2 = jnp.where(ldmk_valid[None, :], d2, 1e9)
    neg_d2, idx = jax.lax.top_k(-d2, knn)
    # clamp-then-gate, matching blend_anchor_motion's order
    # (dists<1e-10 -> 1e-10; dists>search_radius -> 1e10)
    dist = jnp.maximum(jnp.sqrt(jnp.maximum(-neg_d2, 0.0)), 1e-10)
    dist = jnp.where(dist > search_radius, 1e10, dist)
    w = 1.0 / dist
    w = w / jnp.sum(w, axis=1, keepdims=True)
    flow_pred = jnp.sum(ldmk_flow[idx] * w[..., None], axis=1)
    err = jnp.linalg.norm(flow_pred - metric_flow_gt, axis=1)
    any_ldmk = jnp.sum(ldmk_valid) > 0
    ok = (err < recall_thr).astype(jnp.float32)
    if metric_valid is None:
        recall = jnp.mean(ok)
    else:
        mv = metric_valid.astype(jnp.float32)
        recall = jnp.sum(ok * mv) / jnp.maximum(jnp.sum(mv), 1.0)
    return jnp.where(any_ldmk, recall, 0.0)
