"""Probe the trained NeCo confidence distribution on eval pairs (CPU).

Diagnoses why NeCo on/off A/Bs come out bit-identical: for a few pairs of
a split, run the matcher + NeCo with rejection OFF, label each extracted
match inlier/outlier with the GT warp (same 0.04 m criterion as
metrics/matching.inlier_ratio), and print the confidence stats per class.
If min(conf) > inlier_thr the filter is a no-op by construction; if inlier
and outlier confidences overlap, NeCo has not learned a discriminative
signal for this regime (reference semantics: outlier_rejection/loss.py
balanced BCE should push them apart).

Usage:
  python scripts/probe_neco_confidence.py --weights snapshot/landmark_trained_occ.npz \
      --split 4DLoMatch-Occ [--pairs 3] [--augment]
"""
import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deformationpyramid_tpu.data.collate import (
    build_pair_pyramid, calibrate_neighborhood_limits)
from deformationpyramid_tpu.data.fourdmatch import FourDMatchDataset
from deformationpyramid_tpu.match.backbone import KPFCN_ARCHITECTURE
from deformationpyramid_tpu.match.config_loader import landmark_config_from_yaml
from deformationpyramid_tpu.match.landmark import (
    init_landmark_model, landmark_inference)
from deformationpyramid_tpu.utils.checkpoint import load_pytree
from deformationpyramid_tpu.utils.config import load_config
from deformationpyramid_tpu.cli.eval_supervised import interp_flow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config/LNDP.yaml")
    ap.add_argument("--weights", required=True)
    ap.add_argument("--split", default="4DLoMatch-Occ")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--augment", action="store_true",
                    help="probe the TRAIN-time distribution (random-SO3 "
                         "rotated pairs) instead of the eval one")
    args = ap.parse_args()

    cfg = load_config(args.config)
    lcfg = landmark_config_from_yaml(
        cfg["ldmk_config"], inlier_thr=cfg.get("inlier_thr", 0.3),
        reject_outliers=False, max_matches=None)

    params = init_landmark_model(jax.random.key(0), lcfg)
    params = load_pytree(args.weights, params)

    ds = FourDMatchDataset(cfg["data_root"], args.split,
                           augment=args.augment)
    ds.entries = ds.entries[:args.pairs]
    sample_pairs = [(ds[i].src, ds[i].tgt) for i in range(min(3, len(ds)))]
    limits = calibrate_neighborhood_limits(sample_pairs, lcfg.matcher.kpfcn,
                                           KPFCN_ARCHITECTURE)

    infer = jax.jit(
        lambda p, pyr, sl, tl, s_cap, t_cap: landmark_inference(
            p, pyr, sl, tl, lcfg, s_cap=s_cap, t_cap=t_cap),
        static_argnums=(4, 5))

    thr = cfg.get("inlier_thr", 0.3)
    all_conf, all_inlier = [], []
    for i in range(len(ds)):
        pair = ds[i]
        pyr = build_pair_pyramid(pair.src, pair.tgt, lcfg.matcher.kpfcn,
                                 KPFCN_ARCHITECTURE, limits)
        pyrd = {"points": [jnp.array(p) for p in pyr.points],
                "valids": [jnp.array(v) for v in pyr.valids],
                "neighbors": [jnp.array(x) for x in pyr.neighbors],
                "pools": [jnp.array(x) for x in pyr.pools],
                "upsamples": [jnp.array(x) for x in pyr.upsamples],
                "features": jnp.array(pyr.features)}
        cl = lcfg.matcher.coarse_level
        cap = 512
        while cap < max(int(pyr.src_lengths[cl]), int(pyr.tgt_lengths[cl])):
            cap *= 2
        data = infer(params, pyrd, jnp.int32(pyr.src_lengths[cl]),
                     jnp.int32(pyr.tgt_lengths[cl]), cap, cap)
        conf = np.asarray(data["neco_confidence"])
        valid = np.asarray(data["vec_6d_mask"]).astype(bool)
        if not valid.any():
            # rotated pairs through the augment-free matcher can yield
            # zero mutual-max matches above threshold (--augment mode)
            print(f"pair {i}: 0 matches")
            continue
        ls = np.asarray(data["ldmk_s"])[valid]
        lt = np.asarray(data["ldmk_t"])[valid]
        conf = conf[valid]
        flow_at = interp_flow(ls, pair)
        warped = (pair.rot @ (ls + flow_at).T + pair.trans).T
        inl = np.linalg.norm(warped - lt, axis=1) < 0.04
        all_conf.append(conf)
        all_inlier.append(inl)
        print(f"pair {i}: {valid.sum()} matches, GT-IR {inl.mean():.3f}, "
              f"conf min/med/max {conf.min():.3f}/"
              f"{np.median(conf):.3f}/{conf.max():.3f}, "
              f"below thr({thr}): {(conf < thr).mean():.3f}")

    conf = np.concatenate(all_conf)
    inl = np.concatenate(all_inlier)
    print(f"\nTOTAL {len(conf)} matches over {len(ds)} pairs "
          f"(augment={args.augment})")
    for name, m in (("GT inliers", inl), ("GT outliers", ~inl)):
        if m.sum():
            c = conf[m]
            print(f"  {name:12s} n={m.sum():5d}  conf mean {c.mean():.4f}  "
                  f"median {np.median(c):.4f}  "
                  f"frac<thr {(c < thr).mean():.4f}")
    # would-be effect of the filter
    keep = conf > thr
    if keep.any():
        print(f"  filter keeps {keep.mean():.4f} of matches; "
              f"IR before {inl.mean():.4f} -> after {inl[keep].mean():.4f}")


if __name__ == "__main__":
    main()
