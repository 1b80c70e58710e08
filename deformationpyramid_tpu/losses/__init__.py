"""Auxiliary registration losses (reference ``model/loss.py:261-379``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.chamfer import truncated_chamfer, batched_truncated_chamfer  # noqa: F401
from ..ops.render import silhouette_cost, point_2_plane_distance  # noqa: F401

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


def _sym3x3_max_eigval(A: Array) -> Array:
    """Largest eigenvalue of symmetric [N, 3, 3] matrices, closed form.

    Trigonometric method (Smith 1961): no SVD/QR lowering, pure VPU math —
    safe inside while_loops on TPU.
    """
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 ** 2 + a02 ** 2 + a12 ** 2
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # det((A - qI)/p) / 2, expanded
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (b00 * (b11 * b22 - b12 ** 2)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    eig_max = q + 2.0 * p * jnp.cos(phi)
    # nearly-spherical case (p2 ~ 0): all eigenvalues equal q
    return jnp.where(p2 < 1e-20, q, eig_max)


def nerfies_regularization(jacobian: Array, eps: float = 1e-6) -> Array:
    """Elastic log-singular-value penalty (``model/loss.py:373-379``).

    jacobian: [N, 3, 3] per-point warp Jacobians. The reference ships a full
    SVD to CPU double; only the MAX singular value feeds the loss
    (``loss.py:377``), so on TPU we use the closed-form largest eigenvalue
    of J^T J — exact, differentiable, and cheap inside the compiled loop.
    """
    JtJ = jnp.einsum("nji,njk->nik", jacobian, jacobian)
    sig_max = jnp.sqrt(jnp.maximum(_sym3x3_max_eigval(JtJ), eps ** 2))
    log_max = jnp.log(sig_max)
    return jnp.mean(log_max ** 2)


def bce_with_zeros_target(p: Array, valid: Array | None = None) -> Array:
    """torch.nn.BCELoss(p, zeros): -mean(log(1-p)) with -100 clamp."""
    log1mp = jnp.maximum(jnp.log1p(-p), -100.0)
    if valid is None:
        return -jnp.mean(log1mp)
    return -jnp.sum(jnp.where(valid, log1mp, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
