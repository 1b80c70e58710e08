"""KPFCN backbone: encoder/decoder built from an architecture string list.

Re-design of ``/root/reference/correspondence/lepard/backbone.py:5-142`` and
``lepard/models.py:3-21``. The dimension/radius bookkeeping mirrors the
reference exactly (skip dims, doubling per strided layer, simple-block
out/2 quirk) so torch checkpoints port one-to-one.

The eval path ('coarse' phase) runs the encoder plus the first
upsample+unary decoder pair and projects to ``coarse_feature_dim`` with a
1x1 conv (``backbone.py:120-142``); deeper decoder blocks exist for the fine
phase and are built but unused at eval, as in the reference.

Input: a ``pyramid`` dict of padded per-level arrays (see ``data/collate``):
  points[l]    [N_l, 3]     stacked src+tgt points (padded)
  valids[l]    [N_l]        validity mask
  neighbors[l] [N_l, K_l]   radius neighbors within level l (shadow = N_l)
  pools[l]     [N_{l+1}, K] level l indices pooled to level l+1
  upsamples[l] [N_l, K]     level l+1 indices for upsampling to level l
  features     [N_0, in_feats_dim]
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .kpconv import (
    KPConvConfig, apply_resnetb_block, apply_simple_block, apply_unary,
    closest_pool, init_resnetb_block, init_simple_block, init_unary,
    max_pool, _kaiming_uniform,
)

Array = jax.Array

KPFCN_ARCHITECTURE = [
    "simple", "resnetb",
    "resnetb_strided", "resnetb", "resnetb",
    "resnetb_strided", "resnetb", "resnetb",
    "resnetb_strided", "resnetb", "resnetb",
    "nearest_upsample", "unary",
    "nearest_upsample", "unary",
    "nearest_upsample", "unary",
]


def init_kpfcn(key: Array, cfg: KPConvConfig,
               architecture: list[str] = KPFCN_ARCHITECTURE) -> dict:
    """Build the parameter tree; mirrors reference dim bookkeeping."""
    params: dict[str, Any] = {"encoder": [], "decoder": []}
    layer = 0
    r = cfg.first_subsampling_dl * cfg.conv_radius
    in_dim = cfg.in_feats_dim
    out_dim = cfg.first_feats_dim
    encoder_skip_dims = []
    encoder_skips = []
    keys = iter(jax.random.split(key, len(architecture) + 4))

    for block_i, block in enumerate(architecture):
        if any(t in block for t in ("pool", "strided", "upsample", "global")):
            encoder_skips.append(block_i)
            encoder_skip_dims.append(in_dim)
        if "upsample" in block:
            break
        if block.startswith("simple"):
            params["encoder"].append({
                "type": "simple", "layer": layer,
                "strided": "strided" in block,
                "p": init_simple_block(next(keys), in_dim, out_dim, r, cfg)})
            in_dim = out_dim // 2
        elif block.startswith("resnetb"):
            params["encoder"].append({
                "type": "resnetb", "layer": layer,
                "strided": "strided" in block,
                "p": init_resnetb_block(next(keys), in_dim, out_dim, r, cfg)})
            in_dim = out_dim
        else:
            raise ValueError(block)
        if "pool" in block or "strided" in block:
            layer += 1
            r *= 2
            out_dim *= 2

    # 1x1 coarse projections (backbone.py:133-136)
    params["coarse_out"] = {
        "w": _kaiming_uniform(next(keys), (in_dim // 2, cfg.coarse_feature_dim),
                              in_dim // 2),
        "b": jnp.zeros((cfg.coarse_feature_dim,)),
    }

    # decoder
    start_i = next(i for i, b in enumerate(architecture) if "upsample" in b)
    decoder_concats = []
    for block_i, block in enumerate(architecture[start_i:]):
        entry: dict[str, Any] = {"layer": layer}
        if block_i > 0 and "upsample" in architecture[start_i + block_i - 1]:
            in_dim += encoder_skip_dims[layer]
            decoder_concats.append(block_i)
        if block == "unary":
            entry.update(type="unary",
                         p=init_unary(next(keys), in_dim, out_dim, cfg))
        elif "upsample" in block:
            entry.update(type="nearest_upsample", p={})
        else:
            raise ValueError(block)
        params["decoder"].append(entry)
        in_dim = out_dim
        if "upsample" in block:
            layer -= 1
            r *= 0.5
            out_dim = out_dim // 2

    params["fine_out"] = {
        "w": _kaiming_uniform(next(keys), (out_dim, cfg.fine_feature_dim), out_dim),
        "b": jnp.zeros((cfg.fine_feature_dim,)),
    }
    params["_meta"] = {"encoder_skips": tuple(encoder_skips),
                       "decoder_concats": tuple(decoder_concats)}
    return params


def apply_kpfcn_coarse(params: dict, pyramid: dict, cfg: KPConvConfig) -> Array:
    """Encoder + first decoder upsample/unary -> coarse features [N_c, C].

    ``pyramid`` holds padded stacked levels (see module docstring). Returns
    features at the coarse level (level index ``len(points)+coarse_level``).
    """
    pts = pyramid["points"]
    valids = pyramid["valids"]
    neighbors = pyramid["neighbors"]
    pools = pyramid["pools"]
    upsamples = pyramid["upsamples"]
    meta = params["_meta"]

    x = pyramid["features"]
    skip_x = []
    for block_i, blk in enumerate(params["encoder"]):
        if block_i in meta["encoder_skips"]:
            skip_x.append(x)
        l = blk["layer"]
        if blk["strided"]:
            q_pts, s_pts = pts[l + 1], pts[l]
            neighb = pools[l]
            q_valid, s_valid = valids[l + 1], valids[l]
        else:
            q_pts = s_pts = pts[l]
            neighb = neighbors[l]
            q_valid = s_valid = valids[l]
        if blk["type"] == "simple":
            x = apply_simple_block(blk["p"], x, q_pts, s_pts, neighb, q_valid, cfg)
        else:
            x = apply_resnetb_block(blk["p"], x, q_pts, s_pts, neighb,
                                    q_valid, s_valid, blk["strided"], cfg)

    for block_i, blk in enumerate(params["decoder"][:2]):
        if block_i in meta["decoder_concats"]:
            x = jnp.concatenate([x, skip_x.pop()], axis=1)
        l = blk["layer"]
        if blk["type"] == "nearest_upsample":
            x = closest_pool(x, upsamples[l - 1])
        else:
            x = apply_unary(blk["p"], x, valids[l], cfg)

    coarse = x @ params["coarse_out"]["w"] + params["coarse_out"]["b"]
    return coarse
