"""Rotation / rigid-motion parameterizations as pure JAX functions.

TPU-native re-design of the reference math layer (semantics of
``/root/reference/model/rigid_body.py:5-119``): every function here is a pure,
jit/vmap/grad-compatible ``jnp`` function operating on batched leading axes.

Conventions
-----------
* Rotations are ``[..., 3, 3]`` matrices acting on column vectors.
* All functions are numerically guarded (``_safe_norm``) so a zero input never
  poisons a whole vmapped batch with NaNs; the guards are below any scale that
  affects metric parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


def _safe_norm(x: Array, axis: int = -1, keepdims: bool = True) -> Array:
    """L2 norm with a tiny floor so the gradient at 0 is finite."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, _EPS))


def skew(w: Array) -> Array:
    """[..., 3] axis vector -> [..., 3, 3] skew-symmetric matrix.

    Matches reference ``model/rigid_body.py:89-95``.
    """
    zero = jnp.zeros_like(w[..., 0])
    rows = jnp.stack(
        [
            zero, -w[..., 2], w[..., 1],
            w[..., 2], zero, -w[..., 0],
            -w[..., 1], w[..., 0], zero,
        ],
        axis=-1,
    )
    return rows.reshape(w.shape[:-1] + (3, 3))


def exp_so3(w: Array, theta: Array) -> Array:
    """Rodrigues' formula: unit axis ``w`` [..., 3], angle ``theta`` [..., 1].

    Returns [..., 3, 3]. Matches reference ``model/rigid_body.py:113-119``.
    """
    theta = theta[..., None]  # [..., 1, 1]
    W = skew(w)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + jnp.sin(theta) * W + (1.0 - jnp.cos(theta)) * (W @ W)


def exp_se3(w: Array, v: Array, theta: Array) -> tuple[Array, Array]:
    """Screw motion exponential (used by the Nerfies baseline).

    ``w``/``v`` are unit rotation axis / translation direction [..., 3],
    ``theta`` [..., 1]. Returns (R [..., 3, 3], t [..., 3, 1]).
    Matches reference ``model/rigid_body.py:97-111``.
    """
    theta = theta[..., None]
    W = skew(w)
    WW = W @ W
    eye = jnp.eye(3, dtype=w.dtype)
    R = eye + jnp.sin(theta) * W + (1.0 - jnp.cos(theta)) * WW
    p = eye + (1.0 - jnp.cos(theta)) * W + (theta - jnp.sin(theta)) * WW
    t = p @ v[..., None]
    return R, t


def axis_angle_to_SO3(r: Array) -> Array:
    """Unnormalized axis-angle vector [..., 3] -> rotation matrix.

    Reference composes ``theta = |r|; w = r/theta; exp_so3(w, theta)``
    (``model/nets.py:150-153``); here fused with a safe norm.
    """
    theta = _safe_norm(r, axis=-1, keepdims=True)
    w = r / theta
    return exp_so3(w, theta)


def rotate_axis_angle(r: Array, x: Array) -> Array:
    """Apply exp(skew(r)) to x without materializing [..., 3, 3] matrices.

    Vector Rodrigues form: R x = x + sin(t) (w x x) + (1 - cos(t)) (w (w.x) - x)
    with t = |r|, w = r/t — mathematically identical to
    ``apply_rotation(axis_angle_to_SO3(r), x)`` but a handful of [N, 3] VPU
    ops instead of per-point 3x3 matmul chains (the registration hot path).
    """
    theta = _safe_norm(r, axis=-1, keepdims=True)
    w = r / theta
    s, c = jnp.sin(theta), jnp.cos(theta)
    wxx = jnp.cross(w, x)
    wdx = jnp.sum(w * x, axis=-1, keepdims=True)
    return x + s * wxx + (1.0 - c) * (w * wdx - x)


def rotate_axis_angle_t(r: Array, x: Array) -> Array:
    """:func:`rotate_axis_angle` for the TRANSPOSED [3, N] point layout.

    Identical math, component axis leading. The [3, N] layout puts the
    point axis on the 128-wide TPU lane dimension, so each elementwise op
    uses N lanes instead of 3-of-128 — the [N, 3] layout wastes 97% of
    every VPU tile, which is what made the solver's per-iteration cost
    linear in batch size (docs/PERFORMANCE.md round-3).
    """
    sq = jnp.sum(r * r, axis=0, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(sq, _EPS))
    w = r / theta
    s, c = jnp.sin(theta), jnp.cos(theta)
    wxx = jnp.cross(w, x, axis=0)
    wdx = jnp.sum(w * x, axis=0, keepdims=True)
    return x + s * wxx + (1.0 - c) * (w * wdx - x)


def euler_to_SO3(euler: Array, convention: str = "XYZ") -> Array:
    """Euler angles [..., 3] -> rotation, R = Rx @ Ry @ Rz for "XYZ".

    Matches reference ``model/rigid_body.py:19-56``.
    """

    def axis_rot(axis: str, angle: Array) -> Array:
        c, s = jnp.cos(angle), jnp.sin(angle)
        one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
        if axis == "X":
            flat = (one, zero, zero, zero, c, -s, zero, s, c)
        elif axis == "Y":
            flat = (c, zero, s, zero, one, zero, -s, zero, c)
        elif axis == "Z":
            flat = (c, -s, zero, s, c, zero, zero, zero, one)
        else:
            raise ValueError(f"bad axis {axis!r}")
        return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))

    if len(convention) != 3 or any(a not in "XYZ" for a in convention):
        raise ValueError(f"bad convention {convention!r}")
    mats = [axis_rot(a, ang) for a, ang in zip(convention, jnp.moveaxis(euler, -1, 0))]
    return mats[0] @ mats[1] @ mats[2]


def _copysign(a: Array, b: Array) -> Array:
    """Magnitude of ``a`` with the sign flipped where signs of a/b differ.

    Matches reference ``model/rigid_body.py:58-60`` (not IEEE copysign: a
    zero ``b`` keeps ``a`` untouched).
    """
    signs_differ = (a < 0) != (b < 0)
    return jnp.where(signs_differ, -a, a)


def quaternion_to_SO3(q: Array) -> Array:
    """(possibly unnormalized) quaternion [..., 4] (r,i,j,k) -> rotation.

    Matches reference ``model/rigid_body.py:62-85``.
    """
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.maximum(jnp.sum(q * q, axis=-1), _EPS)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def normalize_quaternion(q: Array) -> Array:
    """Sign-fixed normalization used before ``quaternion_to_SO3``.

    Matches reference ``model/nets.py:154-157``: divide by ``copysign(|q|, q_r)``
    so the scalar part stays non-negative.
    """
    s = jnp.sum(q * q, axis=-1)
    denom = _copysign(jnp.sqrt(jnp.maximum(s, _EPS)), q[..., 0])
    return q / denom[..., None]


def sixd_to_SO3(d6: Array) -> Array:
    """6D rotation representation (Zhou et al., CVPR'19) -> rotation matrix.

    Gram-Schmidt on the two 3-vectors; rows of the result are the basis,
    matching reference ``model/rigid_body.py:5-16``.
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / _safe_norm(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / _safe_norm(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def apply_rotation(R: Array, x: Array) -> Array:
    """Apply per-point rotation: R [..., 3, 3] @ x [..., 3] -> [..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, x)
