"""Kernel Point Convolution and network blocks, functional JAX.

Re-design of the reference KPConv stack
(``/root/reference/correspondence/lepard/blocks.py``) for TPU:

* flat stacked clouds [N, ...] with **static padded shapes**; the shadow
  point is the appended row at index N (reference appends a 1e6-offset row,
  ``blocks.py:269``), so host-built neighbor tables use N for "no neighbor",
* the kernel-influence aggregation is two MXU matmuls
  ([K_p, K_n] @ [K_n, C_in] then contraction with [K_p, C_in, C_out]),
* BatchNormBlock is InstanceNorm over the stacked cloud in the reference
  (``blocks.py:443-445``, the InstanceNorm-as-BatchNorm quirk); here a
  masked per-channel normalization over valid rows (no affine, eps 1e-5).

All blocks are (init_fn -> params, apply_fn(params, x, level_data)) pairs.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .kernel_points import kernel_dispositions

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class KPConvConfig:
    """kpfcn_config subset (``configs/lepard.yaml:5-28``)."""

    num_kernel_points: int = 15
    in_points_dim: int = 3
    KP_extent: float = 2.0          # relative to subsampling dl
    conv_radius: float = 2.5
    deform_radius: float = 5.0
    modulated: bool = False         # deformable: per-KP modulation scalars
    KP_influence: str = "linear"
    aggregation_mode: str = "sum"
    fixed_kernel_points: str = "center"
    use_batch_norm: bool = True
    batch_norm_momentum: float = 0.02
    first_subsampling_dl: float = 0.01
    first_feats_dim: int = 256
    in_feats_dim: int = 1
    coarse_feature_dim: int = 528
    fine_feature_dim: int = 264
    coarse_level: int = -2


def _kaiming_uniform(key, shape, fan_in):
    # torch kaiming_uniform_(a=sqrt(5)) ==> bound = 1/sqrt(fan_in)
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_kpconv(key: Array, in_ch: int, out_ch: int, radius: float,
                cfg: KPConvConfig, deformable: bool = False) -> dict:
    """Params hold the trainable weights plus the kernel-point disposition
    as a non-trainable float buffer (stop-gradient at apply; zero update
    under any optimizer). Keeping dispositions in the tree mirrors the
    reference's per-module ``kernel_points`` buffers so torch checkpoints
    port them directly (each module's disposition differs by the random
    rotation applied at load, ``kernels/kernel_points.py:433-470``).

    With ``deformable`` (reference ``blocks.py:179-193``) the tree gains a
    nested rigid ``offset_conv`` predicting per-point kernel offsets (+
    modulation scalars when ``cfg.modulated``) and a zero-init
    ``offset_bias``."""
    k = cfg.num_kernel_points
    k_main, k_off = jax.random.split(key)
    p = {
        "weights": _kaiming_uniform(k_main, (k, in_ch, out_ch), in_ch * k),
        "kernel_points": jnp.asarray(kernel_dispositions(
            k, cfg.in_points_dim, cfg.fixed_kernel_points, radius)),
    }
    if deformable:
        offset_dim = (cfg.in_points_dim + (1 if cfg.modulated else 0)) * k
        p["offset_conv"] = init_kpconv(k_off, in_ch, offset_dim, radius, cfg)
        p["offset_bias"] = jnp.zeros((offset_dim,))
    return p


def apply_kpconv(p: dict, q_pts: Array, s_pts: Array, neighb: Array,
                 x: Array, extent: float, cfg: KPConvConfig,
                 deformable: bool = False, with_aux: bool = False):
    """q_pts [Nq, 3], s_pts [Ns, 3], neighb [Nq, K] (shadow = Ns), x [Ns, C].

    Mirrors ``KPConv.forward`` (``blocks.py:229-374``). The deformable
    branch (``blocks.py:235-316``) predicts per-point kernel offsets with a
    nested rigid KPConv, optionally modulates per-kernel-point contributions
    by ``2*sigmoid``, and prunes neighbors outside every deformed kernel's
    ``extent``. The reference prunes by dynamically shrinking the neighbor
    axis (``blocks.py:297-316``) — a host-driven shape change; here the
    pruned rows are remapped to the shadow index instead, which is
    value-identical (their gathered features are zero, so they drop out of
    both the weighted sum and the neighbor-count normalization) and keeps
    the shape static for XLA.

    With ``with_aux`` returns ``(out, aux)`` where aux carries ``min_d2``
    [Nq, Kp] (squared distance of each deformed kernel point to its nearest
    neighbor, saved by the reference for a fitting loss, ``blocks.py:295``)
    and ``deformed_kp`` [Nq, Kp, 3].
    """
    kernel_points = jax.lax.stop_gradient(p["kernel_points"])
    s_pad = jnp.concatenate([s_pts, jnp.full((1, s_pts.shape[1]), 1e6,
                                             s_pts.dtype)], axis=0)

    neighbors = s_pad[neighb] - q_pts[:, None]          # [Nq, K, 3]
    # ||n - kp||^2 expanded: avoids materializing the [Nq, K, Kp, 3]
    # difference tensor (432 MB at full 60k-point scale)
    n2 = jnp.sum(neighbors * neighbors, axis=-1)         # [Nq, K]
    aux = {}
    if deformable:
        off = apply_kpconv(p["offset_conv"], q_pts, s_pts, neighb, x,
                           extent, cfg) + p["offset_bias"]
        k, d = cfg.num_kernel_points, cfg.in_points_dim
        if cfg.modulated:
            unscaled = off[:, :d * k].reshape(-1, k, d)
            modulations = 2.0 * jax.nn.sigmoid(off[:, d * k:])  # [Nq, Kp]
        else:
            unscaled = off.reshape(-1, k, d)
            modulations = None
        # offsets are in units of KP_extent (blocks.py:257-258)
        dkp = kernel_points[None] + unscaled * extent    # [Nq, Kp, 3]
        kp2 = jnp.sum(dkp * dkp, axis=-1)                # [Nq, Kp]
        cross = jnp.einsum("nkd,npd->nkp", neighbors, dkp)
        sq = n2[:, :, None] + kp2[:, None, :] - 2.0 * cross
        sq = jnp.maximum(sq, 0.0)
        # nearest-neighbor distance per deformed kernel point, computed
        # BEFORE pruning like the reference (blocks.py:295)
        aux = {"min_d2": jnp.min(sq, axis=1), "deformed_kp": dkp}
        # in-range pruning: neighbors outside every deformed kernel's
        # extent are shadowed out (blocks.py:297-316)
        in_range = jnp.any(sq < extent ** 2, axis=2)     # [Nq, K]
        neighb = jnp.where(in_range, neighb, s_pts.shape[0])
    else:
        modulations = None
        kp2 = jnp.sum(kernel_points * kernel_points, axis=-1)  # [Kp]
        cross = jnp.einsum("nkd,pd->nkp", neighbors, kernel_points)
        sq = n2[:, :, None] + kp2[None, None, :] - 2.0 * cross  # [Nq, K, Kp]
        sq = jnp.maximum(sq, 0.0)

    if cfg.KP_influence == "constant":
        w = jnp.ones_like(sq)
    elif cfg.KP_influence == "linear":
        w = jnp.maximum(1.0 - jnp.sqrt(jnp.maximum(sq, 1e-12)) / extent, 0.0)
    elif cfg.KP_influence == "gaussian":
        sigma = extent * 0.3
        w = jnp.exp(-sq / (2 * sigma ** 2 + 1e-9))
    else:
        raise ValueError(cfg.KP_influence)

    if cfg.aggregation_mode == "closest":
        closest = jnp.argmin(sq, axis=2)
        w = w * jax.nn.one_hot(closest, cfg.num_kernel_points, dtype=w.dtype)
    elif cfg.aggregation_mode != "sum":
        raise ValueError(cfg.aggregation_mode)

    w = jnp.swapaxes(w, 1, 2)                            # [Nq, Kp, K]
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    neighb_x = x_pad[neighb]                             # [Nq, K, C]
    weighted = jnp.einsum("npk,nkc->npc", w, neighb_x)   # [Nq, Kp, C]
    if modulations is not None:
        weighted = weighted * modulations[:, :, None]    # blocks.py:357-358
    out = jnp.einsum("npc,pcd->nd", weighted, p["weights"])

    # neighbor-count normalization: count neighbors whose feature sum > 0
    # (reference quirk, blocks.py:369-372 — shadows have zero features)
    n_valid = jnp.sum(jnp.sum(neighb_x, axis=-1) > 0.0, axis=-1)
    n_valid = jnp.maximum(n_valid, 1)
    out = out / n_valid[:, None].astype(out.dtype)
    if with_aux:
        return out, aux
    return out


def instance_norm(x: Array, valid: Array | None, use_bn: bool,
                  bias: Array | None = None, eps: float = 1e-5) -> Array:
    """Per-channel normalization over (valid) stacked rows; or bias-only."""
    if not use_bn:
        return x + bias
    if valid is None:
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
    else:
        w = valid[:, None].astype(x.dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(x * w, axis=0, keepdims=True) / n
        var = jnp.sum(((x - mean) ** 2) * w, axis=0, keepdims=True) / n
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if valid is not None:
        y = jnp.where(valid[:, None], y, 0.0)
    return y


def leaky_relu(x: Array) -> Array:
    return jax.nn.leaky_relu(x, 0.1)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def init_unary(key: Array, in_dim: int, out_dim: int, cfg: KPConvConfig) -> dict:
    p = {"w": _kaiming_uniform(key, (in_dim, out_dim), in_dim)}
    if not cfg.use_batch_norm:
        p["bias"] = jnp.zeros((out_dim,))
    return p


def apply_unary(p: dict, x: Array, valid: Array | None, cfg: KPConvConfig,
                no_relu: bool = False) -> Array:
    x = x @ p["w"]
    x = instance_norm(x, valid, cfg.use_batch_norm, p.get("bias"))
    if not no_relu:
        x = leaky_relu(x)
    return x


def init_simple_block(key: Array, in_dim: int, out_dim: int, radius: float,
                      cfg: KPConvConfig, deformable: bool = False) -> dict:
    p = {"kpconv": init_kpconv(key, in_dim, out_dim // 2, radius, cfg,
                               deformable=deformable)}
    if not cfg.use_batch_norm:
        p["bias"] = jnp.zeros((out_dim // 2,))
    return p


def apply_simple_block(p: dict, x: Array, q_pts, s_pts, neighb, q_valid,
                       radius: float, cfg: KPConvConfig) -> Array:
    # deformable iff the params carry an offset conv; the block extent is
    # radius*KP_extent/conv_radius even for deformable (blocks.py:546)
    extent = radius * cfg.KP_extent / cfg.conv_radius
    x = apply_kpconv(p["kpconv"], q_pts, s_pts, neighb, x, extent, cfg,
                     deformable="offset_conv" in p["kpconv"])
    return leaky_relu(instance_norm(x, q_valid, cfg.use_batch_norm, p.get("bias")))


def init_resnetb_block(key: Array, in_dim: int, out_dim: int, radius: float,
                       cfg: KPConvConfig, deformable: bool = False) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p: dict[str, Any] = {}
    if in_dim != out_dim // 4:
        p["unary1"] = init_unary(k1, in_dim, out_dim // 4, cfg)
    p["kpconv"] = init_kpconv(k2, out_dim // 4, out_dim // 4, radius, cfg,
                              deformable=deformable)
    if not cfg.use_batch_norm:
        p["bias_conv"] = jnp.zeros((out_dim // 4,))
    p["unary2"] = init_unary(k3, out_dim // 4, out_dim, cfg)
    if in_dim != out_dim:
        p["shortcut"] = init_unary(k4, in_dim, out_dim, cfg)
    return p


def max_pool(x: Array, inds: Array) -> Array:
    """[Ns, C] features, [Nq, K] indices (shadow = Ns) -> [Nq, C] max."""
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return jnp.max(x_pad[inds], axis=1)


def closest_pool(x: Array, inds: Array) -> Array:
    """Pool from the first (closest) neighbor column (``blocks.py:71-83``)."""
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return x_pad[inds[:, 0]]


def apply_resnetb_block(p: dict, features: Array, q_pts, s_pts, neighb,
                        q_valid, s_valid, strided: bool, radius: float,
                        cfg: KPConvConfig) -> Array:
    extent = radius * cfg.KP_extent / cfg.conv_radius
    x = features
    if "unary1" in p:
        x = apply_unary(p["unary1"], x, s_valid, cfg)
    x = apply_kpconv(p["kpconv"], q_pts, s_pts, neighb, x, extent, cfg,
                     deformable="offset_conv" in p["kpconv"])
    x = leaky_relu(instance_norm(x, q_valid, cfg.use_batch_norm,
                                 p.get("bias_conv")))
    x = apply_unary(p["unary2"], x, q_valid, cfg, no_relu=True)
    shortcut = max_pool(features, neighb) if strided else features
    if "shortcut" in p:
        shortcut = apply_unary(p["shortcut"], shortcut, q_valid, cfg, no_relu=True)
    return leaky_relu(x + shortcut)
