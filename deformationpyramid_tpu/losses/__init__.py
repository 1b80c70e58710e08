"""Auxiliary registration losses (reference ``model/loss.py:261-379``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.chamfer import truncated_chamfer, batched_truncated_chamfer  # noqa: F401

Array = jax.Array


def landmark_cost(x: Array, y: Array, valid: Array | None = None) -> Array:
    """Mean squared distance between matched landmarks (``loss.py:348-351``)."""
    sq = jnp.sum((x - y) ** 2, axis=-1)
    if valid is None:
        return jnp.mean(sq)
    return jnp.sum(jnp.where(valid, sq, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def arap_cost(R: Array, t: Array, g: Array, e: Array, w: Array,
              e_valid: Array | None = None) -> Array:
    """As-rigid-as-possible cost over deformation-graph edges.

    R [N,3,3] node rotations, t [N,3] node translations, g [N,3] node
    positions, e [N,K] neighbor indices, w [N,K] edge weights. Matches
    ``model/loss.py:261-285``; ``e_valid`` masks padded edges.
    """
    g_j = g[e]                        # [N, K, 3]
    t_j = t[e]
    d = g_j - g[:, None]              # [N, K, 3]
    rot_d = jnp.einsum("nij,nkj->nki", R, d)
    e_ij = jnp.sum((rot_d + g[:, None] + t[:, None] - g_j - t_j) ** 2, axis=-1)
    cost = w * e_ij
    if e_valid is None:
        return jnp.mean(cost)
    return jnp.sum(jnp.where(e_valid, cost, 0.0)) / jnp.maximum(jnp.sum(e_valid), 1)


def nerfies_regularization(jacobian: Array, eps: float = 1e-6) -> Array:
    """Elastic log-singular-value penalty (``model/loss.py:373-379``).

    jacobian: [N, 3, 3] per-point warp Jacobians. The reference ships the SVD
    to CPU double for speed; on TPU a batched f32 3x3 SVD via XLA is fast and
    accurate enough (singular values of near-identity Jacobians).
    """
    svals = jnp.linalg.svd(jacobian, compute_uv=False)
    svals = jnp.maximum(svals, eps)
    log_max = jnp.log(jnp.max(svals, axis=-1))
    return jnp.mean(log_max ** 2)


def bce_with_zeros_target(p: Array, valid: Array | None = None) -> Array:
    """torch.nn.BCELoss(p, zeros): -mean(log(1-p)) with -100 clamp."""
    log1mp = jnp.maximum(jnp.log1p(-p), -100.0)
    if valid is None:
        return -jnp.mean(log1mp)
    return -jnp.sum(jnp.where(valid, log1mp, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
