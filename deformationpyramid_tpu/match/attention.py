"""Geometry-aware multi-head attention layer.

Reference parity: ``GeometryAttentionLayer``
(``/root/reference/correspondence/lepard/transformer.py:10-93``) and its
outlier-rejection twin with the compatibility multiplier
(``outlier_rejection/geometry_attention.py:87-88``). One functional layer
serves both. Single-cloud convention [N, C]; vmap for batches.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .position_encoding import embed_rotary

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    feature_dim: int = 528
    n_head: int = 4
    pe_type: str = "rotary"
    # 'bfloat16' runs every matmul with bf16 operands and f32 accumulation
    # (preferred_element_type) — the full-throughput MXU path; softmax,
    # masking, layer norms, and residuals stay f32. Inference-only knob;
    # default f32 preserves bit-level reference parity.
    compute_dtype: str = "float32"
    # 'flash' streams the attention through the Pallas TPU flash-attention
    # kernel (online softmax): the [L, S, heads] logits tensor — 268 MB of
    # f32 at 4096-point coarse caps, and the measured HBM bottleneck of
    # the repositioning transformer — is never materialized. Padding masks
    # map to flash segment ids (valid-prefix). Falls back to 'xla' when a
    # compatibility multiplier is present (NeCo) or off-TPU.
    attention_impl: str = "xla"        # 'xla' | 'flash'


def _xavier(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_attention_layer(key: Array, cfg: AttentionConfig) -> dict:
    d = cfg.feature_dim
    ks = jax.random.split(key, 6)
    return {
        "q": _xavier(ks[0], (d, d)),
        "k": _xavier(ks[1], (d, d)),
        "v": _xavier(ks[2], (d, d)),
        "merge": _xavier(ks[3], (d, d)),
        "mlp1": _xavier(ks[4], (2 * d, 2 * d)),
        "mlp2": _xavier(ks[5], (2 * d, d)),
        "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
    }


def _flash_available() -> bool:
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _flash_attention(qw: Array, kw: Array, vw: Array,
                     source_mask: Array | None, sm_scale: float) -> Array:
    """Streamed attention via the Pallas TPU flash kernel (differentiable —
    the stock op ships a custom VJP).

    qw [L, h, d], kw/vw [S, h, d] -> [L, h, d]. The source padding mask
    (valid-prefix booleans) becomes flash segment ids: queries carry id 1,
    invalid source rows id 0, so the kernel never attends padding —
    matching the XLA path's -inf masking exactly (padded QUERY rows attend
    normally and produce garbage in both paths; downstream masks them).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    L, h, d = qw.shape
    S = kw.shape[0]
    # the stock kernel wants head_dim <= 128 or a multiple of 128;
    # zero-padding is exact (padded q/k dims contribute 0 to every dot
    # product; padded v dims emit zeros, sliced away below) and free on
    # the MXU, whose lanes pad d=132 to 256 either way
    if d > 128 and d % 128:
        d_pad = ((d + 127) // 128) * 128
        pad = [(0, 0), (0, 0), (0, d_pad - d)]
        qw, kw, vw = (jnp.pad(a, pad) for a in (qw, kw, vw))
    q = qw.transpose(1, 0, 2)[None]          # [1, h, L, d_pad]
    k = kw.transpose(1, 0, 2)[None]
    v = vw.transpose(1, 0, 2)[None]
    kv_seg = (source_mask.astype(jnp.int32) if source_mask is not None
              else jnp.ones((S,), jnp.int32))
    seg = SegmentIds(q=jnp.ones((1, L), jnp.int32), kv=kv_seg[None])
    o = flash_attention(q, k, v, segment_ids=seg, sm_scale=sm_scale)
    return o[0].transpose(1, 0, 2)[:, :, :d]  # [L, h, d]


def _layer_norm(x: Array, p: dict, eps: float = 1e-5) -> Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def apply_attention_layer(p: dict, x: Array, source: Array,
                          x_pe: Array | None, source_pe: Array | None,
                          x_mask: Array | None, source_mask: Array | None,
                          cfg: AttentionConfig,
                          compatibility: Array | None = None) -> Array:
    """x [L, C] queries attend into source [S, C]; returns [L, C].

    pe handling matches the reference: 'sinusoidal' adds pe before q/k
    projection; 'rotary' rotates the projected q/k; 'none' skips pe.
    ``compatibility`` [L, S] multiplies raw attention logits (NeCo).
    """
    h, dim = cfg.n_head, cfg.feature_dim // cfg.n_head
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def mm(a, b):
        """Matmul with compute-dtype operands, f32 accumulation."""
        return jnp.matmul(a.astype(cdt), b.astype(cdt),
                          preferred_element_type=jnp.float32)

    q_in, k_in, v_in = x, source, source
    if cfg.pe_type == "sinusoidal" and x_pe is not None:
        q_in = q_in + x_pe
        k_in = k_in + source_pe
    qw = mm(q_in, p["q"])
    kw = mm(k_in, p["k"])
    vw = mm(v_in, p["v"])
    if cfg.pe_type == "rotary" and x_pe is not None:
        qw = embed_rotary(qw, x_pe[..., 0], x_pe[..., 1])
        kw = embed_rotary(kw, source_pe[..., 0], source_pe[..., 1])

    L, S = qw.shape[0], kw.shape[0]
    qw = qw.reshape(L, h, dim)
    kw = kw.reshape(S, h, dim)
    vw = vw.reshape(S, h, dim)

    use_flash = (cfg.attention_impl == "flash" and compatibility is None
                 and _flash_available() and L % 128 == 0 and S % 128 == 0)
    if use_flash:
        import math

        o = _flash_attention(qw, kw, vw, source_mask,
                             1.0 / math.sqrt(dim)).reshape(L, h * dim)
        message = _layer_norm(mm(o, p["merge"]), p["ln1"])
        message = jnp.concatenate([x, message], axis=-1)
        message = mm(jax.nn.relu(mm(message, p["mlp1"])), p["mlp2"])
        message = _layer_norm(message, p["ln2"])
        return x + message

    a = jnp.einsum("lhd,shd->lsh", qw.astype(cdt), kw.astype(cdt),
                   preferred_element_type=jnp.float32)
    if compatibility is not None:
        a = a * compatibility[..., None]
    if source_mask is not None:
        q_m = x_mask if x_mask is not None else jnp.ones((L,), bool)
        drop = q_m[:, None] & (~source_mask)[None, :]
        a = jnp.where(drop[..., None], -jnp.inf, a)
    a = a / jnp.sqrt(dim)
    a = jax.nn.softmax(a, axis=1)
    o = jnp.einsum("lsh,shd->lhd", a.astype(cdt), vw.astype(cdt),
                   preferred_element_type=jnp.float32).reshape(L, h * dim)

    message = _layer_norm(mm(o, p["merge"]), p["ln1"])
    message = jnp.concatenate([x, message], axis=-1)
    message = mm(jax.nn.relu(mm(message, p["mlp1"])), p["mlp2"])
    message = _layer_norm(message, p["ln2"])
    return x + message
