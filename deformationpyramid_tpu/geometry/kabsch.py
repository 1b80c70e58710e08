"""Weighted rigid fitting (Kabsch/Umeyama) and embedded-deformation warp.

Reference parity: ``rigid_fit`` (``/root/reference/model/geometry.py:8-33``,
which ships 3x3 SVDs to CPU double — on TPU a batched f32 SVD is accurate at
these condition numbers) and ``ED_warp`` (``model/geometry.py:37-49``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rigid_fit(X: Array, Y: Array, w: Array, eps: float = 1e-4) -> tuple[Array, Array]:
    """Weighted least-squares rigid transform R, t with R @ X + t ~ Y.

    X, Y: [B, N, 3]; w: [B, N, 1] non-negative confidence weights.
    Returns R [B, 3, 3], t [B, 3, 1]. Reflection is fixed by the sign of
    det(U) det(V) on the smallest singular vector (Umeyama).
    """
    W1 = jnp.sum(jnp.abs(w), axis=1, keepdims=True)
    w_norm = w / (W1 + eps)
    mean_X = jnp.sum(w_norm * X, axis=1, keepdims=True)
    mean_Y = jnp.sum(w_norm * Y, axis=1, keepdims=True)
    Sxy = jnp.einsum("bni,bnj->bij", Y - mean_Y, w_norm * (X - mean_X))
    U, _, Vt = jnp.linalg.svd(Sxy)
    det = jnp.linalg.det(U) * jnp.linalg.det(jnp.swapaxes(Vt, -1, -2))
    S = jnp.broadcast_to(jnp.eye(3), Sxy.shape).at[:, 2, 2].mul(0.0)
    S = S + jnp.zeros_like(S).at[:, 2, 2].set(det)
    R = U @ S @ Vt
    t = jnp.swapaxes(mean_Y, 1, 2) - R @ jnp.swapaxes(mean_X, 1, 2)
    return R, t


def ed_warp(x: Array, g: Array, R: Array, t: Array, w: Array) -> Array:
    """Embedded-deformation skinning (Sumner 2007).

    x [N, 3] points, per-point K anchors: g [N, K, 3] anchor node positions,
    R [N, K, 3, 3] node rotations, t [N, K, 3] node translations,
    w [N, K] normalized skinning weights. Returns warped [N, 3].
    """
    local = x[:, None] - g                                # [N, K, 3]
    rotated = jnp.einsum("nkij,nkj->nki", R, local)       # [N, K, 3]
    y = (rotated + g + t) * w[..., None]
    return jnp.sum(y, axis=1)
