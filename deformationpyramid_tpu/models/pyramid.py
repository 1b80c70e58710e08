"""Neural Deformation Pyramid — TPU-native model core.

Re-design of the reference ``Deformation_Pyramid``/``NDPLayer``
(``/root/reference/model/nets.py:10-183``). Instead of m separate ``nn.Module``
objects, all m levels' parameters are **stacked along a leading level axis**,
so a single compiled program (indexing the stack) serves every level of the
coarse-to-fine loop — no per-level retracing, and ``lax.scan`` composes the
full warp.

Behavioral parity notes (things that look like bugs but are load-bearing):
* posenc uses a single frequency ``2**(level+1+k0)`` — the reference defines
  ``pi = 3.14`` but does NOT multiply it in (``nets.py:164-177``).
* every head's output is scaled by ``mlp_scale = 0.001`` so optimization
  starts near the identity warp (``nets.py:107,117,125,133``).
* Sim3 scale is ``0.001 * s + 1`` (``nets.py:125``).
* nonrigidity gating ``x' = x + nr * (x_warp - x)`` is active only when
  ``w_reg > 0`` and level > 0 (``nets.py:27,132-134``).
* level-0 layer has no nonrigidity branch in the reference; here the branch
  params exist at every level (homogeneous stacking) but level 0 is gated off,
  so its nr params are unused and receive zero gradient.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..geometry import rotations as rot

Array = jax.Array

ROTATION_DIMS = {"euler": 3, "axis_angle": 3, "quaternion": 4, "6D": 6}
MOTIONS = ("SE3", "Sim3", "sflow")


@dataclasses.dataclass(frozen=True)
class NDPConfig:
    """Static pyramid hyperparameters (reference ``config/NDP.yaml``)."""

    m: int = 9                # number of pyramid levels
    k0: int = -8              # base log2 frequency offset
    depth: int = 3            # MLP depth (1 input layer + depth-1 hidden)
    width: int = 128
    rotation_format: str = "axis_angle"
    motion: str = "SE3"
    nonrigidity_est: bool = False
    mlp_scale: float = 1e-3

    def __post_init__(self):
        assert self.motion in MOTIONS, self.motion
        assert self.rotation_format in ROTATION_DIMS, self.rotation_format

    @property
    def rot_dim(self) -> int:
        return ROTATION_DIMS[self.rotation_format]


def _linear_init(key: Array, shape_w: tuple[int, ...], fan_in: int, fan_out: int):
    """Xavier-uniform weight + torch-default uniform bias.

    Mirrors the reference init: xavier_uniform_ on every weight matrix
    (``nets.py:180-183``) while biases keep the torch ``nn.Linear`` default
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """
    kw, kb = jax.random.split(key)
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(kw, shape_w, jnp.float32, -limit, limit)
    b_limit = 1.0 / jnp.sqrt(fan_in)
    b = jax.random.uniform(kb, shape_w[:-2] + (shape_w[-1],), jnp.float32,
                           -b_limit, b_limit)
    return {"w": w, "b": b}


def init_pyramid_params(key: Array, cfg: NDPConfig) -> dict[str, Any]:
    """Initialize stacked parameters for all m levels: leaves are [m, ...]."""
    m, w, d = cfg.m, cfg.width, cfg.depth
    n_hidden = max(d - 1, 0)
    keys = jax.random.split(key, 6)
    params = {
        "input": _linear_init(keys[0], (m, 6, w), 6, w),
        "hidden": _linear_init(keys[1], (m, n_hidden, w, w), w, w),
        "trn": _linear_init(keys[2], (m, w, 3), w, 3),
    }
    if cfg.motion in ("SE3", "Sim3"):
        params["rot"] = _linear_init(keys[3], (m, w, cfg.rot_dim), w, cfg.rot_dim)
    if cfg.motion == "Sim3":
        params["scale"] = _linear_init(keys[4], (m, w, 1), w, 1)
    if cfg.nonrigidity_est:
        params["nr"] = _linear_init(keys[5], (m, w, 1), w, 1)
    return params


def level_params(params: dict[str, Any], level: Array | int) -> dict[str, Any]:
    """Slice one level out of the stacked params (dynamic index OK)."""
    return jax.tree.map(lambda p: jax.lax.dynamic_index_in_dim(p, level, 0, keepdims=False), params)


def posenc(x: Array, level: Array | int, k0: int) -> Array:
    """Single-frequency sin/cos encoding, freq = 2**(level+1+k0).

    Feature order [sin x, cos x, sin y, cos y, sin z, cos z] matches the
    reference (``nets.py:164-177``) for checkpoint-porting compatibility.
    """
    freq = jnp.exp2(jnp.asarray(level, jnp.float32) + 1.0 + k0)
    s, c = jnp.sin(x * freq), jnp.cos(x * freq)
    return jnp.stack([s[..., 0], c[..., 0], s[..., 1], c[..., 1], s[..., 2], c[..., 2]], axis=-1)


def _head(fea: Array, p: dict[str, Array]) -> Array:
    return fea @ p["w"] + p["b"]


def level_features(p: dict[str, Any], x: Array, level: Array | int, cfg: NDPConfig) -> Array:
    """Shared trunk: posenc -> input linear+ReLU -> hidden MLP."""
    fea = posenc(x, level, cfg.k0)
    fea = jax.nn.relu(_head(fea, p["input"]))

    def hidden_step(h, lp):
        return jax.nn.relu(h @ lp["w"] + lp["b"]), None

    if cfg.depth > 1:
        fea, _ = jax.lax.scan(hidden_step, fea, p["hidden"])
    return fea


def rotation_from_features(r: Array, fmt: str) -> Array:
    """Head output [..., rot_dim] (already mlp_scaled) -> [..., 3, 3]."""
    if fmt == "euler":
        return rot.euler_to_SO3(r)
    if fmt == "axis_angle":
        return rot.axis_angle_to_SO3(r)
    if fmt == "quaternion":
        return rot.quaternion_to_SO3(rot.normalize_quaternion(r))
    if fmt == "6D":
        return rot.sixd_to_SO3(r)
    raise ValueError(fmt)


def level_warp(p: dict[str, Any], x: Array, level: Array | int,
               cfg: NDPConfig) -> tuple[Array, Array | None]:
    """Warp points [N, 3] through a single pyramid level.

    Returns (warped [N, 3], nonrigidity [N] or None). Mirrors
    ``NDPLayer.forward`` (``nets.py:111-140``).
    """
    fea = level_features(p, x, level, cfg)
    t = cfg.mlp_scale * _head(fea, p["trn"])

    if cfg.motion == "sflow":
        x_ = x + t
    elif cfg.rotation_format == "axis_angle":
        # hot path: matrix-free Rodrigues application (no [N,3,3] chains)
        rx = rot.rotate_axis_angle(cfg.mlp_scale * _head(fea, p["rot"]), x)
        if cfg.motion == "Sim3":
            s = cfg.mlp_scale * _head(fea, p["scale"]) + 1.0
            x_ = s * rx + t
        else:
            x_ = rx + t
    else:
        R = rotation_from_features(cfg.mlp_scale * _head(fea, p["rot"]), cfg.rotation_format)
        x_ = rot.apply_rotation(R, x) + t
        if cfg.motion == "Sim3":
            s = cfg.mlp_scale * _head(fea, p["scale"]) + 1.0
            x_ = s * rot.apply_rotation(R, x) + t

    nonrigidity = None
    if cfg.nonrigidity_est:
        nr = jax.nn.sigmoid(cfg.mlp_scale * _head(fea, p["nr"]))[..., 0]
        # Level 0 never gates (reference constructs it without the branch).
        gate_on = jnp.asarray(level, jnp.int32) > 0
        x_gated = x + nr[..., None] * (x_ - x)
        x_ = jnp.where(gate_on, x_gated, x_)
        nonrigidity = jnp.where(gate_on, nr, jnp.ones_like(nr))
    return x_, nonrigidity


def warp_numpy(params, x, cfg: NDPConfig):
    """Host-side (numpy) full-pyramid warp, mirroring :func:`warp`.

    Used by the eval fast path's ``--host-metrics`` mode: when the
    tunneled chip's link is congested, fetching the ~150 KB param tree and
    warping the full cloud on the host is ~5x fewer bytes than shipping
    [N, 7] metric blocks up and running the warp on-device
    (``cli/eval_nolearned.py``). SE3/Sim3/sflow + axis_angle only (the
    benchmark configs); parity with :func:`level_warp` is pinned by
    ``tests/test_pyramid.py``.
    """
    import numpy as np

    assert cfg.rotation_format == "axis_angle" and not cfg.nonrigidity_est
    x = np.asarray(x, np.float32)
    p = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
         for k, v in params.items()}
    for lvl in range(cfg.m):
        freq = np.float32(2.0 ** (lvl + 1 + cfg.k0))
        s, c = np.sin(x * freq), np.cos(x * freq)
        fea = np.stack([s[:, 0], c[:, 0], s[:, 1], c[:, 1],
                        s[:, 2], c[:, 2]], axis=-1)
        fea = np.maximum(fea @ p["input"]["w"][lvl] + p["input"]["b"][lvl], 0.0)
        for h in range(p["hidden"]["w"].shape[1]):
            fea = np.maximum(fea @ p["hidden"]["w"][lvl, h]
                             + p["hidden"]["b"][lvl, h], 0.0)
        t = cfg.mlp_scale * (fea @ p["trn"]["w"][lvl] + p["trn"]["b"][lvl])
        if cfg.motion == "sflow":
            x = x + t
            continue
        r = cfg.mlp_scale * (fea @ p["rot"]["w"][lvl] + p["rot"]["b"][lvl])
        theta = np.sqrt(np.maximum((r * r).sum(-1, keepdims=True), 1e-12))
        w = r / theta
        sn, cs = np.sin(theta), np.cos(theta)
        wxx = np.cross(w, x)
        wdx = (w * x).sum(-1, keepdims=True)
        rx = x + sn * wxx + (1.0 - cs) * (w * wdx - x)
        if cfg.motion == "Sim3":
            sc = cfg.mlp_scale * (fea @ p["scale"]["w"][lvl]
                                  + p["scale"]["b"][lvl]) + 1.0
            x = sc * rx + t
        else:
            x = rx + t
    return x


def posenc_t(xt: Array, level: Array | int, k0: int) -> Array:
    """:func:`posenc` for the transposed [3, N] layout -> [6, N].

    Row order matches posenc's feature order [sin x, cos x, sin y, cos y,
    sin z, cos z] so the same ``input`` weights serve both layouts.
    """
    freq = jnp.exp2(jnp.asarray(level, jnp.float32) + 1.0 + k0)
    s, c = jnp.sin(xt * freq), jnp.cos(xt * freq)
    return jnp.stack([s[0], c[0], s[1], c[1], s[2], c[2]], axis=0)


def _head_t(fea_t: Array, p: dict[str, Array]) -> Array:
    """[w, N] features x [w, out] head -> [out, N]."""
    return p["w"].T @ fea_t + p["b"][:, None]


def level_features_t(p: dict[str, Any], xt: Array, level: Array | int,
                     cfg: NDPConfig) -> Array:
    """:func:`level_features` in the transposed layout: [3, N] -> [w, N]."""
    fea = posenc_t(xt, level, cfg.k0)
    fea = jax.nn.relu(_head_t(fea, p["input"]))

    def hidden_step(h, lp):
        return jax.nn.relu(lp["w"].T @ h + lp["b"][:, None]), None

    if cfg.depth > 1:
        fea, _ = jax.lax.scan(hidden_step, fea, p["hidden"])
    return fea


def level_warp_t(p: dict[str, Any], xt: Array, level: Array | int,
                 cfg: NDPConfig) -> Array:
    """:func:`level_warp` on TRANSPOSED [3, N] points -> warped [3, N].

    Same math (same params, same quirks); the [3, N] layout puts the point
    axis on the TPU's 128-lane dimension so elementwise ops use N lanes
    instead of 3-of-128 (see ``rotations.rotate_axis_angle_t``). Supported
    for the chamfer-only solver hot path: no nonrigidity branch (w_reg=0
    benchmark config, ``config/NDP.yaml``).
    """
    assert not cfg.nonrigidity_est, "transposed path is w_reg=0 only"
    fea = level_features_t(p, xt, level, cfg)
    t = cfg.mlp_scale * _head_t(fea, p["trn"])

    if cfg.motion == "sflow":
        return xt + t
    if cfg.rotation_format == "axis_angle":
        rx = rot.rotate_axis_angle_t(cfg.mlp_scale * _head_t(fea, p["rot"]),
                                     xt)
    else:
        r = cfg.mlp_scale * _head_t(fea, p["rot"])
        R = rotation_from_features(r.T, cfg.rotation_format)
        rx = rot.apply_rotation(R, xt.T).T
    if cfg.motion == "Sim3":
        s = cfg.mlp_scale * _head_t(fea, p["scale"]) + 1.0
        return s * rx + t
    return rx + t


def warp(params: dict[str, Any], x: Array, cfg: NDPConfig,
         max_level: int | None = None, min_level: int = 0) -> tuple[Array, Array | None]:
    """Compose warps of levels [min_level, max_level] sequentially.

    Mirrors ``Deformation_Pyramid.warp`` (``nets.py:36-48``); returns the
    final points and the last level's nonrigidity map.
    """
    if max_level is None:
        max_level = cfg.m - 1
    assert max_level < cfg.m

    levels = jnp.arange(min_level, max_level + 1)
    sliced = jax.tree.map(lambda p: p[min_level:max_level + 1], params)

    def step(carry, inp):
        lvl_p, lvl = inp
        x_, nr = level_warp(lvl_p, carry, lvl, cfg)
        return x_, nr

    out, nrs = jax.lax.scan(step, x, (sliced, levels))
    last_nr = None if nrs is None or not cfg.nonrigidity_est else nrs[-1]
    return out, last_nr
