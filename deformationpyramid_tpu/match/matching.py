"""Coarse feature matching: dual-softmax or Sinkhorn OT with dustbin.

Reference parity: ``/root/reference/correspondence/lepard/matching.py``.
Single-pair convention: feats [S, C]/[T, C], masks [S]/[T]; the dynamic
match list becomes a fixed-size top-K extraction with a validity mask
(TPU-static shapes).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .position_encoding import embed_pos

Array = jax.Array

_NEG = -1e9  # torch uses -inf; a large finite value avoids NaN rows on TPU


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    feature_dim: int = 528
    confidence_threshold: float = 0.1
    dsmax_temperature: float = 0.1
    match_type: str = "dual_softmax"   # 'dual_softmax' | 'sinkhorn'
    skh_init_bin_score: float = 1.0
    skh_iters: int = 3
    # None (default) = uncapped: every mutual-max match above threshold is
    # extracted, like the reference (matching.py:71-88) — the static
    # capacity scales with the bucketed coarse cloud size. An int pins a
    # fixed top-k capacity (the pre-round-4 behavior; froze matcher recall
    # at k/|GT| on dense pairs).
    max_matches: int | None = None
    compute_dtype: str = "float32"     # 'bfloat16' = MXU-speed inference


def init_matching(key: Array, cfg: MatchingConfig) -> dict:
    d = cfg.feature_dim
    limit = jnp.sqrt(6.0 / (d + d))
    k1, _ = jax.random.split(key)
    p = {"src_proj": jax.random.uniform(k1, (d, d), jnp.float32, -limit, limit)}
    if cfg.match_type == "sinkhorn":
        p["bin_score"] = jnp.asarray(cfg.skh_init_bin_score, jnp.float32)
    return p


def log_optimal_transport(scores: Array, alpha: Array, iters: int,
                          src_mask: Array, tgt_mask: Array) -> Array:
    """Log-domain sinkhorn with a learned dustbin row/col
    (``matching.py:6-38``). scores [S, T] -> log assignment [S+1, T+1]."""
    m, n = scores.shape
    ms = jnp.sum(src_mask).astype(scores.dtype)
    ns = jnp.sum(tgt_mask).astype(scores.dtype)
    bins0 = jnp.full((m, 1), alpha, scores.dtype)
    bins1 = jnp.full((1, n), alpha, scores.dtype)
    z = jnp.block([[scores, bins0], [bins1, alpha[None, None]]])
    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate([jnp.full((m,), norm), (jnp.log(ns) + norm)[None]])
    log_nu = jnp.concatenate([jnp.full((n,), norm), (jnp.log(ms) + norm)[None]])

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(z + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(z + u[:, None], axis=0)
        return u, v

    u, v = jax.lax.fori_loop(0, iters, body,
                             (jnp.zeros_like(log_mu), jnp.zeros_like(log_nu)))
    return z + u[:, None] + v[None, :] - norm


def confidence_matrix(p: dict, src_feats: Array, tgt_feats: Array,
                      src_pe: Array | None, tgt_pe: Array | None,
                      src_mask: Array, tgt_mask: Array,
                      cfg: MatchingConfig, pe_type: str = "rotary") -> Array:
    """[S, T] match confidence. NOTE: the reference projects BOTH clouds with
    ``src_proj`` (``matching.py:126-127`` uses self.src_proj twice — tgt_proj
    is dead weight); reproduced here for checkpoint parity."""
    cdt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
           else jnp.float32)
    src = jnp.matmul(src_feats.astype(cdt), p["src_proj"].astype(cdt),
                     preferred_element_type=jnp.float32)
    tgt = jnp.matmul(tgt_feats.astype(cdt), p["src_proj"].astype(cdt),
                     preferred_element_type=jnp.float32)
    if src_pe is not None:
        src = embed_pos(pe_type, src, src_pe)
        tgt = embed_pos(pe_type, tgt, tgt_pe)
    c = src.shape[-1]
    src = src / c ** 0.5
    tgt = tgt / c ** 0.5

    if cfg.match_type == "dual_softmax":
        sim = jnp.einsum("sc,tc->st", src.astype(cdt), tgt.astype(cdt),
                         preferred_element_type=jnp.float32) \
            / cfg.dsmax_temperature
        sim1 = jnp.where(src_mask[:, None], sim, _NEG)
        sim2 = jnp.where(tgt_mask[None, :], sim, _NEG)
        conf = jax.nn.softmax(sim1, axis=0) * jax.nn.softmax(sim2, axis=1)
    elif cfg.match_type == "sinkhorn":
        sim = jnp.einsum("sc,tc->st", src, tgt)
        sim = jnp.where(src_mask[:, None] & tgt_mask[None, :], sim, _NEG)
        log_assign = log_optimal_transport(sim, p["bin_score"], cfg.skh_iters,
                                           src_mask, tgt_mask)
        conf = jnp.exp(log_assign)[:-1, :-1]
    else:
        raise NotImplementedError(cfg.match_type)
    # zero out padded rows/cols so downstream top-k never selects them
    return conf * (src_mask[:, None] & tgt_mask[None, :])


def extract_matches(conf: Array, thr: float, k: int,
                    mutual: bool = True) -> tuple[Array, Array, Array]:
    """Top-k mutual-max matches above threshold (``matching.py:71-88``).

    Returns (idx [k, 2] (src, tgt), conf [k], valid [k]). Static shapes:
    invalid slots carry index 0 and valid=False.
    """
    mask = conf > thr
    if mutual:
        mask &= (conf == jnp.max(conf, axis=1, keepdims=True))
        mask &= (conf == jnp.max(conf, axis=0, keepdims=True))
    scores = jnp.where(mask, conf, -1.0).reshape(-1)
    top_scores, flat_idx = jax.lax.top_k(scores, k)
    valid = top_scores > 0.0
    t = conf.shape[1]
    idx = jnp.stack([flat_idx // t, flat_idx % t], axis=-1)
    idx = jnp.where(valid[:, None], idx, 0)
    return idx, jnp.where(valid, top_scores, 0.0), valid


def extract_matches_all(conf: Array, thr: float) -> tuple[Array, Array, Array]:
    """ALL mutual-max matches above threshold (``matching.py:71-88``).

    A mutual-max match needs ``conf[s, t]`` to be both its row and column
    maximum, so each src row yields at most one match: capacity [S] with a
    validity mask is exact, no top-k sort over the flat [S*T] scores
    needed. Rows are emitted in src order (the reference emits nonzero()
    order; downstream consumers — NeCo, landmark loss, procrustes — are
    order-insensitive). Exact-tie rows (several entries equal to the row
    max, measure-zero in float) keep one match where the reference keeps
    all; padded rows/cols are all-zero and fail ``thr``.

    Returns (idx [S, 2] (src, tgt), conf [S], valid [S]).
    """
    s = conf.shape[0]
    t_idx = jnp.argmax(conf, axis=1)                               # [S]
    c = jnp.take_along_axis(conf, t_idx[:, None], axis=1)[:, 0]    # [S]
    s_back = jnp.argmax(conf, axis=0)                              # [T]
    mutual = s_back[t_idx] == jnp.arange(s)
    valid = (c > thr) & mutual
    idx = jnp.stack([jnp.arange(s), t_idx], axis=-1)
    idx = jnp.where(valid[:, None], idx, 0)
    return idx, jnp.where(valid, c, 0.0), valid
