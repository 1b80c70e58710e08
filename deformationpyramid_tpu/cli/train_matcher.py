"""Train the Lepard matcher with MatchMotionLoss on a 4DMatch-format suite.

The reference trains its matcher in the upstream Lepard repository and only
ships checkpoints (``/root/reference/correspondence/landmark_estimator.py:33-39``,
``configs/correspondence.yaml:1-5``); this repo exposes the training surface
directly — focal correspondence loss + rigid-motion loss per positioning
layer (``lepard/loss.py:80-188``), coarse GT matches built exactly like the
reference collate (``datasets/dataloader.py:552-562``: blend the raw scene
flow to the coarse level, GT-warp, mutual-NN within ``coarse_match_radius``).

Usage:
  python -m deformationpyramid_tpu.cli.train_matcher --config config/LNDP.yaml \
      [--data-root data/split] [--epochs 20] [--limit N] [--lr 1e-4]
"""
from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from ..data.collate import build_pair_pyramid, calibrate_neighborhood_limits
from ..data.correspondence_utils import blend_scene_flow, mutual_nn_correspondence
from ..data.fourdmatch import FourDMatchDataset
from ..match.backbone import KPFCN_ARCHITECTURE
from ..match.landmark import LandmarkConfig, init_landmark_model
from ..train.trainer import TrainConfig, train_matcher
from ..utils.checkpoint import load_pytree
from ..utils.config import load_config


def _pow2(n: int, minimum: int = 512) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def make_matcher_batch_stream(ds: FourDMatchDataset, lcfg: LandmarkConfig,
                              limits, coarse_match_radius: float = 0.024,
                              cache: bool = True):
    """Yield device-ready matcher-training dicts, one pair at a time.

    Every pair carries static power-of-two ``s_cap``/``t_cap`` (symmetric)
    so the compiled fwd+bwd step is shared across the sweep (each distinct
    cap pair costs a fresh full-matcher compile).

    ``cache=True`` keeps the collated device batches across epochs — with
    ``augment=False`` the pyramids are deterministic, and re-collating cost
    ~0.5-1 s/pair/epoch of single-core host time, an order of magnitude
    more than the on-chip step it feeds.
    """
    cl = lcfg.matcher.coarse_level
    cached: list[dict] = []

    def build(i):
            pair = ds[i]
            pyr = build_pair_pyramid(pair.src, pair.tgt, lcfg.matcher.kpfcn,
                                     KPFCN_ARCHITECTURE, limits,
                                     pad_to="pow2")
            s_len = pyr.src_lengths[cl]
            t_len = pyr.tgt_lengths[cl]
            cap = _pow2(max(s_len, t_len))
            coarse = pyr.points[cl]
            c_src = coarse[:s_len]
            c_tgt = coarse[s_len:s_len + t_len]
            # deformation-only flow (flow_gt stores the composed motion):
            # flow_def = R^-1 (flow_gt + Ps - t) - Ps, blended coarse like
            # the reference (sflow_list is the raw flow, dataloader.py:557)
            flow_def = (pair.rot.T @ (pair.flow_gt + pair.src
                                      - pair.trans.T).T).T - pair.src
            c_flow = blend_scene_flow(c_src, pair.src,
                                      flow_def.astype(np.float32))
            warped = (pair.rot @ (c_src + c_flow).T + pair.trans).T
            corr = mutual_nn_correspondence(warped, c_tgt,
                                            search_radius=coarse_match_radius)
            match_gt = np.zeros((cap, 2), np.int64)
            match_gt_valid = np.zeros((cap,), bool)
            m = min(len(corr), cap)
            match_gt[:m] = corr[:m]
            match_gt_valid[:m] = True
            coarse_flow = np.zeros((cap, 3), np.float32)
            coarse_flow[:s_len] = c_flow
            return {
                "pyramid": {
                    "points": [jnp.array(p) for p in pyr.points],
                    "valids": [jnp.array(v) for v in pyr.valids],
                    "neighbors": [jnp.array(x) for x in pyr.neighbors],
                    "pools": [jnp.array(x) for x in pyr.pools],
                    "upsamples": [jnp.array(x) for x in pyr.upsamples],
                    "features": jnp.array(pyr.features),
                },
                "src_len_c": jnp.int32(s_len),
                "tgt_len_c": jnp.int32(t_len),
                "match_gt": jnp.array(match_gt),
                "match_gt_valid": jnp.array(match_gt_valid),
                "coarse_flow": jnp.array(coarse_flow),
                "gt_rot": jnp.array(pair.rot),
                "gt_trn": jnp.array(pair.trans),
                "s_cap": cap,
                "t_cap": cap,
            }

    def stream():
        if cache and cached:
            yield from cached
            return
        for i in range(len(ds)):
            b = build(i)
            if cache:
                cached.append(b)
            yield b

    return stream


def main():
    from ..utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--split", default="train")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--resume-weights", default=None,
                    help="matcher npz to continue from")
    ap.add_argument("--snapshot-dir", default="snapshot/matcher")
    args = ap.parse_args()

    cfg = load_config(args.config)
    data_root = args.data_root or cfg.get("data_root")
    import os

    ldmk_yaml = cfg.get("ldmk_config")
    if ldmk_yaml and os.path.exists(ldmk_yaml):
        from ..match.config_loader import landmark_config_from_yaml

        lcfg = landmark_config_from_yaml(ldmk_yaml)
    else:
        lcfg = LandmarkConfig()
    ds = FourDMatchDataset(data_root, args.split, augment=False)
    if args.limit:
        ds.entries = ds.entries[: args.limit]
    if len(ds) == 0:
        raise SystemExit(f"no training data under {data_root}/{args.split}")

    params = init_landmark_model(jax.random.key(0), lcfg)
    matcher_params = params["matcher"]
    if args.resume_weights:
        matcher_params = load_pytree(args.resume_weights, matcher_params)

    sample_pairs = [(ds[i].src, ds[i].tgt) for i in range(min(3, len(ds)))]
    limits = calibrate_neighborhood_limits(sample_pairs, lcfg.matcher.kpfcn,
                                           KPFCN_ARCHITECTURE)
    tcfg = TrainConfig(max_epoch=args.epochs, optimizer="Adam", lr=args.lr,
                       weight_decay=cfg.get("weight_decay", 1e-6),
                       scheduler="ExpLR",
                       scheduler_gamma=cfg.get("scheduler_gamma", 0.99),
                       snapshot_dir=args.snapshot_dir)
    radius = 0.024
    lepard_yaml = None
    try:
        corr = load_config(cfg.get("ldmk_config")) if ldmk_yaml else None
        if corr is not None:
            lepard_yaml = load_config(corr.matcher_config)
            radius = lepard_yaml.coarse_matching.get("coarse_match_radius",
                                                     0.024)
    except Exception:
        pass
    train_matcher(matcher_params, lcfg, tcfg,
                  make_matcher_batch_stream(ds, lcfg, limits, radius),
                  steps_per_epoch=len(ds))


if __name__ == "__main__":
    main()
