"""Multiview outlier rejection: correspondence-graph attention (GAT) models.

Reference parity: ``correspondence/outlier_rejection/cycle_consistency.py``
(Outlier_Rejection with a view-graph GAT), ``graph_attention.py:40-157``
(GATLayer with scatter-add edge attention) and ``geometry_attention.py:110-197``
(NonLocalNet, the PointDSC-style alternative). The multiview model refines
per-match features by alternating within-pair 6D attention with
cross-pair graph attention over a correspondence graph whose edges connect
matches that touch the same point cloud within a search radius.

TPU design: edge lists are host-built, padded to a static edge capacity and
masked; the scatter-adds become ``jax.ops.segment_sum`` over static segment
counts.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from .attention import init_attention_layer, apply_attention_layer
from .outlier_rejection import NeCoConfig, _vol_pe_6d, _torch_linear

Array = jax.Array


# ---------------------------------------------------------------------------
# GAT layer (edge-list attention)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GATConfig:
    feature_dim: int = 144
    n_head: int = 8
    dropout: float = 0.0   # eval default; training may set >0 (not applied
                           # here — reference uses nn.Dropout, inference off)


def _xavier(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_gat_layer(key: Array, cfg: GATConfig) -> dict:
    d, h = cfg.feature_dim, cfg.n_head
    d_out = d // h
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "input_proj": _xavier(k1, (d, h * d_out)),
        "score_src": _xavier(k2, (1, h, d_out)),
        "score_tgt": _xavier(k3, (1, h, d_out)),
        "bias": jnp.zeros((h * d_out,)),
        "skip_proj": _xavier(k4, (d, h * d_out)),
    }


def apply_gat_layer(p: dict, feat: Array, edge_src: Array, edge_tgt: Array,
                    edge_valid: Array, cfg: GATConfig) -> Array:
    """feat [N, D] node features; edges (src -> tgt) with validity mask.

    Matches ``GATLayer.forward`` (``graph_attention.py:107-157``): per-edge
    LeakyReLU(score_src + score_tgt) attention, softmax-normalized over each
    target's in-edges via segment sums, weighted source aggregation, skip
    connection + bias. Invalid edges contribute nothing.
    """
    n, d = feat.shape
    h = cfg.n_head
    d_out = d // h
    proj = (feat @ p["input_proj"]).reshape(n, h, d_out)
    src_score = jnp.sum(proj * p["score_src"], axis=-1)   # [N, h]
    tgt_score = jnp.sum(proj * p["score_tgt"], axis=-1)

    e_src = jnp.clip(edge_src, 0, n - 1)
    e_tgt = jnp.clip(edge_tgt, 0, n - 1)
    score = jax.nn.leaky_relu(src_score[e_src] + tgt_score[e_tgt], 0.2)  # [E, h]
    score = score - jax.lax.stop_gradient(jnp.max(score))
    exp_s = jnp.where(edge_valid[:, None], jnp.exp(score), 0.0)
    denom = jax.ops.segment_sum(exp_s, e_tgt, num_segments=n)            # [N, h]
    att = exp_s / (denom[e_tgt] + 1e-16)

    msg = proj[e_src] * att[..., None]                                   # [E, h, d_out]
    msg = jnp.where(edge_valid[:, None, None], msg, 0.0)
    out = jax.ops.segment_sum(msg, e_tgt, num_segments=n)                # [N, h, d_out]
    out = out.reshape(n, h * d_out) + p["bias"]
    return out


# ---------------------------------------------------------------------------
# Multiview Outlier_Rejection
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MultiviewNeCoConfig:
    neco: NeCoConfig = dataclasses.field(default_factory=NeCoConfig)
    edge_search_radius: float = 0.1
    alternate: bool = True

    @property
    def gat(self) -> GATConfig:
        return GATConfig(self.neco.feature_dim, self.neco.n_head)


def init_multiview_neco(key: Array, cfg: MultiviewNeCoConfig) -> dict:
    n = cfg.neco.num_layers
    ks = jax.random.split(key, 2 * n + 4)
    return {
        "in_proj": _torch_linear(ks[0], cfg.neco.in_dim, cfg.neco.feature_dim),
        "pair_layers": [init_attention_layer(ks[1 + i], cfg.neco.attention)
                        for i in range(n)],
        "graph_layers": [init_gat_layer(ks[1 + n + i], cfg.gat)
                         for i in range(n)],
        "cls1": _torch_linear(ks[-3], cfg.neco.feature_dim, 64),
        "cls2": _torch_linear(ks[-2], 64, 32),
        "cls3": _torch_linear(ks[-1], 32, 1),
    }


def apply_multiview_neco(params: dict, vec6d: Array, mask: Array,
                         edge_src: Array, edge_tgt: Array, edge_valid: Array,
                         cfg: MultiviewNeCoConfig) -> Array:
    """vec6d [P, K, 6] per-pair matches, mask [P, K]; edges index the
    flattened [P*K] match set. Returns confidence [P, K]."""
    ncfg = cfg.neco
    n_pairs, k, _ = vec6d.shape
    if ncfg.spatial_consistency_check:
        src, tgt = vec6d[..., :3], vec6d[..., 3:]
        d_src = jnp.linalg.norm(src[:, :, None] - src[:, None], axis=-1)
        d_tgt = jnp.linalg.norm(tgt[:, :, None] - tgt[:, None], axis=-1)
        compat = jnp.maximum(1.0 - (d_src - d_tgt) ** 2 / ncfg.sigma_spat ** 2, 0.0)
        compat = jax.lax.stop_gradient(compat)
    else:
        compat = None
    pe = None if ncfg.pe_type == "none" else jax.vmap(
        lambda v: _vol_pe_6d(v, ncfg))(vec6d)

    feat = vec6d @ params["in_proj"]["w"] + params["in_proj"]["b"]
    for pl_, gl in zip(params["pair_layers"], params["graph_layers"]):
        feat = jax.vmap(
            lambda f, p_, m, c: apply_attention_layer(
                pl_, f, f, p_, p_, m, m, ncfg.attention, compatibility=c)
        )(feat, pe, mask, compat)
        if cfg.alternate:
            flat = feat.reshape(n_pairs * k, -1)
            flat = apply_gat_layer(gl, flat, edge_src, edge_tgt, edge_valid,
                                   cfg.gat)
            feat = flat.reshape(n_pairs, k, -1)
    h = jax.nn.relu(feat @ params["cls1"]["w"] + params["cls1"]["b"])
    h = jax.nn.relu(h @ params["cls2"]["w"] + params["cls2"]["b"])
    conf = jax.nn.sigmoid(h @ params["cls3"]["w"] + params["cls3"]["b"])[..., 0]
    return conf * mask


def build_correspondence_graph(vec6d: np.ndarray, mask: np.ndarray,
                               pcd_pairs: np.ndarray, edge_radius: float,
                               max_edges: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side correspondence-graph edges
    (``cycle_consistency.py:166-231``): two matches are connected if their
    endpoints in a shared point cloud lie within ``edge_radius``.

    Returns (edge_src [E], edge_tgt [E], edge_valid [E]) padded to max_edges.
    """
    n_pairs, k, _ = vec6d.shape
    corr_ids = np.arange(n_pairs * k).reshape(n_pairs, k)
    n_pcd = int(pcd_pairs.max()) + 1 if len(pcd_pairs) else 0
    srcs, tgts = [], []
    head = vec6d[..., :3]
    tail = vec6d[..., 3:]
    for p_i in range(n_pcd):
        is_head = pcd_pairs[:, 0] == p_i
        is_tail = pcd_pairs[:, 1] == p_i
        involved = is_head | is_tail
        if involved.sum() < 1:
            continue
        pos = np.where(is_head[involved][:, None, None],
                       head[involved], tail[involved]).reshape(-1, 3)
        ids = corr_ids[involved].reshape(-1)
        m = mask[involved].reshape(-1)
        d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
        ok = (d2 < edge_radius ** 2) & (m[:, None] & m[None])
        si, ti = np.nonzero(ok)
        srcs.append(ids[si])
        tgts.append(ids[ti])
    if srcs:
        es = np.concatenate(srcs)
        et = np.concatenate(tgts)
    else:
        es = et = np.zeros((0,), np.int64)
    e = len(es)
    out_s = np.zeros((max_edges,), np.int64)
    out_t = np.zeros((max_edges,), np.int64)
    valid = np.zeros((max_edges,), bool)
    take = min(e, max_edges)
    out_s[:take], out_t[:take], valid[:take] = es[:take], et[:take], True
    return out_s, out_t, valid


# ---------------------------------------------------------------------------
# NonLocalNet (PointDSC-style alternative confidence model)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NonLocalNetConfig:
    in_dim: int = 6
    num_layers: int = 6
    num_channels: int = 128


def init_nonlocalnet(key: Array, cfg: NonLocalNetConfig = NonLocalNetConfig()) -> dict:
    c = cfg.num_channels
    ks = iter(jax.random.split(key, 4 + cfg.num_layers * 7))
    params = {"layer0": _torch_linear(next(ks), cfg.in_dim, c), "blocks": []}
    for _ in range(cfg.num_layers):
        params["blocks"].append({
            "pointcn": _torch_linear(next(ks), c, c),
            "q": _torch_linear(next(ks), c, c),
            "k": _torch_linear(next(ks), c, c),
            "v": _torch_linear(next(ks), c, c),
            "msg1": _torch_linear(next(ks), c, c // 2),
            "msg2": _torch_linear(next(ks), c // 2, c // 2),
            "msg3": _torch_linear(next(ks), c // 2, c),
        })
    params["cls1"] = _torch_linear(next(ks), c, 32)
    params["cls2"] = _torch_linear(next(ks), 32, 32)
    params["cls3"] = _torch_linear(next(ks), 32, 1)
    return params


def _bn_free(x: Array, valid: Array | None, eps: float = 1e-5) -> Array:
    """BatchNorm1d at inference without running stats: normalize over the
    match axis (the reference trains with torch BN; parity at the
    architecture level, stats computed on the fly)."""
    if valid is None:
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
    else:
        w = valid[:, None].astype(x.dtype)
        nv = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(x * w, axis=0, keepdims=True) / nv
        var = jnp.sum((x - mean) ** 2 * w, axis=0, keepdims=True) / nv
    return (x - mean) * jax.lax.rsqrt(var + eps)


def apply_nonlocalnet(params: dict, vec6d: Array, mask: Array,
                      cfg: NonLocalNetConfig = NonLocalNetConfig()) -> Array:
    """vec6d [K, 6] -> confidence [K] (``geometry_attention.py:156-197``)."""
    feat = vec6d @ params["layer0"]["w"] + params["layer0"]["b"]
    for blk in params["blocks"]:
        h = feat @ blk["pointcn"]["w"] + blk["pointcn"]["b"]
        feat = jax.nn.relu(_bn_free(h, mask))
        q = feat @ blk["q"]["w"] + blk["q"]["b"]
        k_ = feat @ blk["k"]["w"] + blk["k"]["b"]
        v = feat @ blk["v"]["w"] + blk["v"]["b"]
        a = (q @ k_.T) / jnp.sqrt(q.shape[-1])
        a = jnp.where(mask[None, :], a, -1e9)
        w = jax.nn.softmax(a, axis=-1)
        msg = w @ v
        m = jax.nn.relu(_bn_free(msg @ blk["msg1"]["w"] + blk["msg1"]["b"], mask))
        m = jax.nn.relu(_bn_free(m @ blk["msg2"]["w"] + blk["msg2"]["b"], mask))
        m = m @ blk["msg3"]["w"] + blk["msg3"]["b"]
        feat = feat + m
    h = jax.nn.relu(feat @ params["cls1"]["w"] + params["cls1"]["b"])
    h = jax.nn.relu(h @ params["cls2"]["w"] + params["cls2"]["b"])
    conf = jax.nn.sigmoid(h @ params["cls3"]["w"] + params["cls3"]["b"])[:, 0]
    return conf * mask
