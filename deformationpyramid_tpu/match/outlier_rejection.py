"""NeCo outlier rejection: per-match confidence via compatibility attention.

Reference parity: ``Outlier_Rejection``
(``/root/reference/correspondence/outlier_rejection/pipeline.py:9-119``):
matches become 6D vectors [src_xyz ; tgt_xyz], an optional spatial-
consistency matrix clamp(1 - (d_src - d_tgt)^2 / sigma^2) multiplies the
attention logits, N attention layers refine features, and an MLP+sigmoid
emits per-match inlier confidence.

Single-pair convention: vec6d [K, 6] (static padded match count), mask [K].
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .attention import AttentionConfig, apply_attention_layer, init_attention_layer
from .position_encoding import VolPEConfig, volumetric_pe

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NeCoConfig:
    """Defaults follow ``configs/outlier_rejection.yaml``."""

    in_dim: int = 6
    feature_dim: int = 144
    n_head: int = 8
    num_layers: int = 9
    pe_type: str = "rotary"
    voxel_size: float = 0.08
    sigma_spat: float = 0.1
    spatial_consistency_check: bool = True

    @property
    def attention(self) -> AttentionConfig:
        return AttentionConfig(self.feature_dim, self.n_head, self.pe_type)

    @property
    def vol(self) -> VolPEConfig:
        # NeCo applies the volumetric PE to the 6D vector: feature_dim//6
        # frequencies per axis over 6 axes
        return VolPEConfig(feature_dim=self.feature_dim,
                           voxel_size=self.voxel_size, pe_type=self.pe_type)


def _torch_linear(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {"w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)}


def init_neco(key: Array, cfg: NeCoConfig = NeCoConfig()) -> dict:
    ks = jax.random.split(key, cfg.num_layers + 4)
    return {
        "in_proj": _torch_linear(ks[0], cfg.in_dim, cfg.feature_dim),
        "layers": [init_attention_layer(ks[i + 1], cfg.attention)
                   for i in range(cfg.num_layers)],
        "cls1": _torch_linear(ks[-3], cfg.feature_dim, 64),
        "cls2": _torch_linear(ks[-2], 64, 32),
        "cls3": _torch_linear(ks[-1], 32, 1),
    }


def _vol_pe_6d(vec6d: Array, cfg: NeCoConfig) -> Array:
    """NeCo's 6D volumetric PE: the source and target halves each get a
    3-axis encoding at feature_dim//2 and concatenate
    (``outlier_rejection/position_encoding.py:45-55``). That module's
    voxelize has NO volume origin (``:19``), unlike lepard's."""
    import math
    xyz = jax.lax.stop_gradient(vec6d)
    vox = xyz / cfg.voxel_size
    d6 = cfg.feature_dim // 6
    div = jnp.exp(jnp.arange(0, d6, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / d6))
    ang = vox[..., :, None] * div                 # [K, 6, d6//2]
    sin, cos = jnp.sin(ang), jnp.cos(ang)
    if cfg.pe_type == "sinusoidal":
        parts = []
        for a in range(6):
            parts.extend([sin[..., a, :], cos[..., a, :]])
        return jnp.concatenate(parts, axis=-1)
    def dup(f):
        return jnp.stack([f, f], axis=-1).reshape(f.shape[:-1] + (-1,))
    sin_pos = jnp.concatenate([dup(sin[..., a, :]) for a in range(6)], axis=-1)
    cos_pos = jnp.concatenate([dup(cos[..., a, :]) for a in range(6)], axis=-1)
    return jnp.stack([cos_pos, sin_pos], axis=-1)


def apply_neco(params: dict, vec6d: Array, mask: Array,
               cfg: NeCoConfig = NeCoConfig()) -> Array:
    """vec6d [K, 6] padded matches, mask [K] -> confidence [K] in (0, 1)."""
    if cfg.spatial_consistency_check:
        src, tgt = vec6d[:, :3], vec6d[:, 3:]
        d_src = jnp.linalg.norm(src[:, None] - src[None], axis=-1)
        d_tgt = jnp.linalg.norm(tgt[:, None] - tgt[None], axis=-1)
        compat = jnp.maximum(1.0 - (d_src - d_tgt) ** 2 / cfg.sigma_spat ** 2, 0.0)
        compat = jax.lax.stop_gradient(compat)
    else:
        compat = None

    pe = None if cfg.pe_type == "none" else _vol_pe_6d(vec6d, cfg)
    feat = vec6d @ params["in_proj"]["w"] + params["in_proj"]["b"]
    for lp in params["layers"]:
        feat = apply_attention_layer(lp, feat, feat, pe, pe, mask, mask,
                                     cfg.attention, compatibility=compat)
    h = jax.nn.relu(feat @ params["cls1"]["w"] + params["cls1"]["b"])
    h = jax.nn.relu(h @ params["cls2"]["w"] + params["cls2"]["b"])
    conf = jax.nn.sigmoid(h @ params["cls3"]["w"] + params["cls3"]["b"])[:, 0]
    return conf * mask
