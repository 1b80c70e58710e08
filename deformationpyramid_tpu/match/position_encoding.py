"""Volumetric position encoding (sinusoidal / rotary).

Reference parity: ``/root/reference/correspondence/lepard/position_encoding.py``.
Coordinates voxelize against a volume origin, then per-axis sin/cos at
``feature_dim//6`` geometric frequencies; 'rotary' packs (cos, sin) pairs
applied RoFormer-style inside attention.

Single-cloud convention: [N, 3] -> sinusoidal [N, C] or rotary [N, C, 2]
(vmap adds the batch axis).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VolPEConfig:
    feature_dim: int = 528
    voxel_size: float = 0.04
    vol_origin: tuple[float, float, float] = (-3.6, -2.4, 1.14)
    pe_type: str = "rotary"   # 'rotary' | 'sinusoidal' | 'none'


def embed_rotary(x: Array, cos: Array, sin: Array) -> Array:
    """RoFormer rotation: pairs (x_even, x_odd) rotated by (cos, sin)."""
    x2 = jnp.stack([-x[..., 1::2], x[..., ::2]], axis=-1).reshape(x.shape)
    return x * cos + x2 * sin


def embed_pos(pe_type: str, x: Array, pe: Array) -> Array:
    if pe_type == "rotary":
        return embed_rotary(x, pe[..., 0], pe[..., 1])
    if pe_type == "sinusoidal":
        return x + pe
    raise KeyError(pe_type)


def volumetric_pe(xyz: Array, cfg: VolPEConfig) -> Array:
    """[N, 3] -> position code; detached (reference ``:82-84``)."""
    xyz = jax.lax.stop_gradient(xyz)
    origin = jnp.asarray(cfg.vol_origin, xyz.dtype)
    vox = (xyz - origin) / cfg.voxel_size
    d6 = cfg.feature_dim // 3
    div = jnp.exp(jnp.arange(0, d6, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / d6))          # [d//6]
    ang = vox[..., :, None] * div                        # [N, 3, d//6]
    sin, cos = jnp.sin(ang), jnp.cos(ang)
    if cfg.pe_type == "sinusoidal":
        return jnp.concatenate(
            [sin[..., 0, :], cos[..., 0, :], sin[..., 1, :],
             cos[..., 1, :], sin[..., 2, :], cos[..., 2, :]], axis=-1)
    if cfg.pe_type == "rotary":
        # duplicate each frequency: [d//6] -> [d//3] as (f0, f0, f1, f1, ...)
        def dup(f):  # [N, d//6] -> [N, d//3]
            return jnp.stack([f, f], axis=-1).reshape(f.shape[:-1] + (-1,))
        sin_pos = jnp.concatenate([dup(sin[..., a, :]) for a in range(3)], axis=-1)
        cos_pos = jnp.concatenate([dup(cos[..., a, :]) for a in range(3)], axis=-1)
        return jnp.stack([cos_pos, sin_pos], axis=-1)    # [N, C, 2]
    raise KeyError(cfg.pe_type)
