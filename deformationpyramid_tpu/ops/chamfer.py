"""Truncated Chamfer distance, TPU-native.

Semantics match the reference ``compute_truncated_chamfer_distance``
(``/root/reference/model/loss.py:94-258``) exactly where it affects metrics:

* two-sided 1-NN squared distances,
* truncation compares the *squared* distance against ``trunc`` and zeroes the
  contribution (cutting the gradient, like the reference's indexed assign),
* **L1 point reduction**: ``sqrt`` of the squared NN distance, summed then
  divided by the (true, unpadded) point count — reference lines 227-228/233-238,
* batch reduction: sum over batch then divide by batch size (or weight sum).

Differentiation strategy (TPU-first): the argmin index is computed by a
non-differentiable streaming kernel (``ops/knn.py``), then the loss is
rebuilt from gathered points, so forward+backward are O(N) and never touch
the N x M matrix again. The gradient equals pytorch3d's ``knn_points`` VJP
(both query and gathered database points receive gradient).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import nn_argmin, nn_argmin_dual

Array = jax.Array


def _gathered_sum(x: Array, y: Array, idx: Array, x_valid: Array | None,
                  trunc: float | Array) -> Array:
    """Sum over x of sqrt(||x_i - y[idx_i]||^2), truncated; differentiable
    through both the query and the gathered database points."""
    nn = y[idx]
    sq = jnp.sum((x - nn) ** 2, axis=-1)
    keep = sq < trunc
    if x_valid is not None:
        keep = keep & x_valid
    # Double-where keeps the sqrt gradient finite on dropped entries; the tiny
    # floor guards d == 0 exactly (value error <= 1e-8, below metric noise).
    safe = jnp.where(keep, jnp.maximum(sq, 1e-16), 1.0)
    contrib = jnp.where(keep, jnp.sqrt(safe), 0.0)
    return jnp.sum(contrib)


def _gathered_normal_sum(x: Array, y: Array, idx: Array,
                         x_normals: Array, y_normals: Array,
                         x_valid: Array | None,
                         trunc: float | Array) -> Array:
    """Sum over x of 1 - |cos(x_normal_i, y_normal[idx_i])|, zeroed on the
    same truncation mask as the distance term (``loss.py:200-217``)."""
    nn_normals = y_normals[idx]
    sq = jnp.sum((x - y[idx]) ** 2, axis=-1)
    keep = sq < trunc
    if x_valid is not None:
        keep = keep & x_valid
    # F.cosine_similarity(eps=1e-6): clamp each norm from below by eps
    nx = jnp.maximum(jnp.linalg.norm(x_normals, axis=-1), 1e-6)
    ny = jnp.maximum(jnp.linalg.norm(nn_normals, axis=-1), 1e-6)
    cos = jnp.sum(x_normals * nn_normals, axis=-1) / (nx * ny)
    contrib = jnp.where(keep, 1.0 - jnp.abs(cos), 0.0)
    return jnp.sum(contrib)


def _one_sided(x: Array, y: Array, x_valid: Array | None, y_valid: Array | None,
               trunc: float | Array, use_pallas: bool | None) -> tuple[Array, Array]:
    """Sum over x of sqrt(min_j ||x_i - y_j||^2), truncated; returns (sum, idx)."""
    _, idx = nn_argmin(jax.lax.stop_gradient(x), jax.lax.stop_gradient(y),
                       y_valid=y_valid, use_pallas=use_pallas)
    return _gathered_sum(x, y, idx, x_valid, trunc), idx


def truncated_chamfer(x: Array, y: Array,
                      x_valid: Array | None = None,
                      y_valid: Array | None = None,
                      x_length: Array | None = None,
                      y_length: Array | None = None,
                      trunc: float | Array = 1e9,
                      use_pallas: bool | None = None,
                      x_normals: Array | None = None,
                      y_normals: Array | None = None,
                      return_normals: bool = False):
    """Single-pair truncated Chamfer distance (L1 point reduction).

    x: [N, 3] (e.g. warped source sample), y: [M, 3] target sample.
    ``x_valid``/``y_valid`` are padding masks (True = real point); the mean is
    taken over ``x_length``/``y_length`` (defaults: mask sum or full N/M),
    matching the reference's lengths-based mean (``loss.py:233-238``).

    With ``return_normals`` (and both normals given), also returns the
    two-sided cosine-distance term 1 - |cos| between each point's normal and
    its NN's normal (``loss.py:200-217``; note the reference computes this
    but its final ``return cham_dist`` drops it, ``loss.py:255-258`` — here
    it is a real output). The normals term uses the plain mean (no L1 sqrt
    quirk) like the reference.
    """
    n, m = x.shape[0], y.shape[0]
    if x_length is None:
        x_length = jnp.sum(x_valid) if x_valid is not None else n
    if y_length is None:
        y_length = jnp.sum(y_valid) if y_valid is not None else m
    # One fused sweep yields both directions' argmins (on TPU the N x M
    # distance tiles are computed once and never leave VMEM); the
    # differentiable loss is rebuilt from gathers.
    sx = jax.lax.stop_gradient(x)
    sy = jax.lax.stop_gradient(y)
    _, idx_x, _, idx_y = nn_argmin_dual(sx, sy, x_valid=x_valid,
                                        y_valid=y_valid, use_pallas=use_pallas)
    sum_x = _gathered_sum(x, y, idx_x, x_valid, trunc)
    sum_y = _gathered_sum(y, x, idx_y, y_valid, trunc)
    dist = sum_x / x_length + sum_y / y_length
    if not return_normals:
        return dist
    if x_normals is None or y_normals is None:
        raise ValueError("return_normals requires x_normals and y_normals")
    norm_x = _gathered_normal_sum(x, y, idx_x, x_normals, y_normals,
                                  x_valid, trunc)
    norm_y = _gathered_normal_sum(y, x, idx_y, y_normals, x_normals,
                                  y_valid, trunc)
    return dist, norm_x / x_length + norm_y / y_length


def batched_truncated_chamfer(x: Array, y: Array,
                              x_lengths: Array | None = None,
                              y_lengths: Array | None = None,
                              weights: Array | None = None,
                              trunc: float | Array = 1e9,
                              batch_reduction: str | None = "mean",
                              use_pallas: bool | None = None) -> Array:
    """Batched version over [B, N, 3] / [B, M, 3] padded clouds.

    Mirrors the reference's full signature subset actually used in-tree
    (``loss.py:94-258``): lengths masks, weights, mean/sum/None batch
    reduction.
    """
    b, n, _ = x.shape
    m = y.shape[1]
    x_valid = None if x_lengths is None else (jnp.arange(n)[None, :] < x_lengths[:, None])
    y_valid = None if y_lengths is None else (jnp.arange(m)[None, :] < y_lengths[:, None])
    x_len = jnp.full((b,), n, jnp.float32) if x_lengths is None else x_lengths.astype(jnp.float32)
    y_len = jnp.full((b,), m, jnp.float32) if y_lengths is None else y_lengths.astype(jnp.float32)

    def one(xi, yi, xv, yv, xl, yl):
        return truncated_chamfer(xi, yi, x_valid=xv, y_valid=yv,
                                 x_length=xl, y_length=yl, trunc=trunc,
                                 use_pallas=use_pallas)

    xv = x_valid if x_valid is not None else jnp.ones((b, n), bool)
    yv = y_valid if y_valid is not None else jnp.ones((b, m), bool)
    per_pair = jax.vmap(one)(x, y, xv, yv, x_len, y_len)
    if weights is not None:
        per_pair = per_pair * weights
    if batch_reduction is None:
        return per_pair
    total = jnp.sum(per_pair)
    if batch_reduction == "mean":
        div = jnp.sum(weights) if weights is not None else b
        total = total / div
    return total
