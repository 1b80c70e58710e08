"""Landmark model: matcher + outlier rejection -> landmark pairs for LNDP.

Reference parity: ``Landmark_Model``
(``/root/reference/correspondence/landmark_estimator.py:14-75``): run the
Lepard matcher, score matches with NeCo, threshold-filter the 6D vectors
into (ldmk_s, ldmk_t). Static shapes: the landmark set keeps the matcher's
``max_matches`` capacity with a validity mask (invalid rows are zeroed),
which feeds straight into the landmark-mode registration solver.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .outlier_rejection import NeCoConfig, apply_neco, init_neco
from .pipeline import MatcherConfig, apply_matcher, init_matcher

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LandmarkConfig:
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)
    neco: NeCoConfig = dataclasses.field(default_factory=NeCoConfig)
    inlier_thr: float = 0.3        # config/LNDP.yaml inlier_thr
    reject_outliers: bool = True


def init_landmark_model(key: Array, cfg: LandmarkConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {"matcher": init_matcher(k1, cfg.matcher),
            "neco": init_neco(k2, cfg.neco)}


def matcher_inference(params: dict, pyramid: dict, src_len_coarse: Array,
                      tgt_len_coarse: Array, cfg: LandmarkConfig,
                      s_cap: int | None = None,
                      t_cap: int | None = None) -> dict[str, Any]:
    """Matcher half of :func:`landmark_inference` (Lepard forward +
    mutual-max match extraction -> vec_6d rows). Split out so the eval
    CLI's ``--stage-timers`` mode can time matcher and NeCo as separate
    programs (VERDICT r4 #5: attribute the NeCo-on dispatch cost)."""
    return apply_matcher(params["matcher"], pyramid, src_len_coarse,
                         tgt_len_coarse, cfg.matcher,
                         s_cap=s_cap, t_cap=t_cap)


def neco_filter(params: dict, data: dict[str, Any],
                cfg: LandmarkConfig) -> dict[str, Any]:
    """NeCo half: per-match confidence + threshold filter into the padded
    (ldmk_s, ldmk_t, ldmk_valid) landmark set (reference
    ``landmark_estimator.py:63-72``)."""
    confidence = apply_neco(params["neco"], data["vec_6d"],
                            data["vec_6d_mask"], cfg.neco)
    keep = data["vec_6d_mask"]
    if cfg.reject_outliers:
        keep = keep & (confidence > cfg.inlier_thr)
    vec6d = jnp.where(keep[:, None], data["vec_6d"], 0.0)
    return dict(data,
                neco_confidence=confidence,
                ldmk_s=vec6d[:, :3],
                ldmk_t=vec6d[:, 3:],
                ldmk_valid=keep)


def landmark_inference(params: dict, pyramid: dict, src_len_coarse: Array,
                       tgt_len_coarse: Array, cfg: LandmarkConfig,
                       s_cap: int | None = None,
                       t_cap: int | None = None) -> dict[str, Any]:
    """Returns dict with ldmk_s/ldmk_t [K, 3], ldmk_valid [K], plus the
    matcher data for diagnostics.

    ``s_cap``/``t_cap`` are static per-cloud coarse caps: without them both
    clouds pad to the FULL stacked coarse size, quadrupling the
    transformer/matching/procrustes work (the [S, T] objects are the
    matcher's cost).
    """
    data = matcher_inference(params, pyramid, src_len_coarse,
                             tgt_len_coarse, cfg, s_cap=s_cap, t_cap=t_cap)
    return neco_filter(params, data, cfg)
