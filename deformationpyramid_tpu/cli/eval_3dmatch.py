"""3DMatch rigid-registration evaluation: matcher + RANSAC recall.

Composes the two pieces the reference ships but never wires together —
its 3DMatch tester is vestigial (``/root/reference/correspondence/lib/
tester.py:178-181`` returns ``None #_3DMatchTester(config)``) while the
dataset (``correspondence/datasets/_3dmatch.py``) and the RANSAC /
transformation-error utilities (``correspondence/lepard/loss.py:13-43``)
exist. Here: ``ThreeDMatchDataset`` pairs -> KPConv pyramid -> Lepard
matcher (+ optional NeCo filter) -> host Kabsch-RANSAC -> registration
recall at the redwood-data weighted-error convention, plus IR / RRE / RTE.

Usage:
  python -m deformationpyramid_tpu.cli.eval_3dmatch --config config/LNDP.yaml \
      --weights snapshot/landmark_trained_3dm.npz \
      [--info data/split/3DMatch/test_info.npz --base-dir data/split]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..data.collate import build_pair_pyramid, calibrate_neighborhood_limits
from ..data.threedmatch import ThreeDMatchDataset
from ..match.backbone import KPFCN_ARCHITECTURE
from ..match.landmark import LandmarkConfig, init_landmark_model, landmark_inference
from ..metrics.registration import (
    ransac_rigid_from_correspondences, registration_recall, to_transform,
    transformation_error,
)
from ..utils.checkpoint import load_pytree
from ..utils.config import load_config
from ..utils.logging import AverageMeter, Logger, write_run_provenance


def run_eval_3dmatch(lcfg: LandmarkConfig, params, ds: ThreeDMatchDataset,
                     gt_covs, log_dir: str = "snapshot/threedmatch",
                     ransac_iters: int = 5000, ransac_thr: float = 0.05,
                     recall_thr: float = 0.2 ** 2, seed: int = 0,
                     visualize: bool = False) -> dict:
    """Evaluate matcher-driven rigid registration over a 3DMatch dataset.

    Returns the aggregate metrics dict (registration_recall, IR, RRE, RTE).
    """
    import json

    os.makedirs(log_dir, exist_ok=True)
    write_run_provenance(log_dir)
    logger = Logger(os.path.join(log_dir, "3DMatch.log"))
    ledger_fw = open(os.path.join(log_dir, "3DMatch.pairs.jsonl"), "a")

    ldmk_jit = jax.jit(
        lambda p, pyr, sl, tl, s_cap, t_cap: landmark_inference(
            p, pyr, sl, tl, lcfg, s_cap=s_cap, t_cap=t_cap),
        static_argnums=(4, 5))

    sample_pairs = [(ds[i].src, ds[i].tgt) for i in range(min(3, len(ds)))]
    limits = calibrate_neighborhood_limits(sample_pairs, lcfg.matcher.kpfcn,
                                           KPFCN_ARCHITECTURE)

    meters: dict[str, AverageMeter] = {}
    preds, gts, covs = [], [], []
    t0 = time.perf_counter()
    for i in range(len(ds)):
        pair = ds[i]
        pyr = build_pair_pyramid(pair.src, pair.tgt, lcfg.matcher.kpfcn,
                                 KPFCN_ARCHITECTURE, limits, pad_to="pow2")
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
        data = ldmk_jit(params, pyrd, jnp.int32(pyr.src_lengths[cl]),
                        jnp.int32(pyr.tgt_lengths[cl]), cap, cap)
        ldmk_valid = np.asarray(data["ldmk_valid"]).astype(bool)
        ldmk_s = np.asarray(data["ldmk_s"])[ldmk_valid]
        ldmk_t = np.asarray(data["ldmk_t"])[ldmk_valid]

        R, t, inl = ransac_rigid_from_correspondences(
            ldmk_s, ldmk_t, n_iters=ransac_iters, inlier_thr=ransac_thr,
            seed=seed + i)
        pred_T = to_transform(R, t)
        gt_T = to_transform(pair.rot, pair.trans)
        cov = np.asarray(gt_covs[i], np.float64)
        err = transformation_error(np.linalg.inv(pred_T) @ gt_T, cov)

        # rigid IR: matches within 4 cm of the GT-transformed source
        # (outlier_rejection/loss.py:162-190 with zero flow)
        if len(ldmk_s):
            warped = ldmk_s @ pair.rot.T + pair.trans.reshape(3)
            ir = float(np.mean(np.linalg.norm(warped - ldmk_t, axis=1) < 0.04))
        else:
            ir = 0.0
        # RRE (deg) / RTE (m): standard rigid-registration errors
        cos_a = np.clip((np.trace(pair.rot.T @ R) - 1) / 2, -1, 1)
        rre = float(np.degrees(np.arccos(cos_a)))
        rte = float(np.linalg.norm(t - pair.trans.reshape(3)))

        if visualize and len(ldmk_s):
            from ..utils.vis import (export_correspondences_ply,
                                     visualize_correspondences)

            vdir = os.path.join(log_dir, "vis")
            os.makedirs(vdir, exist_ok=True)
            base = os.path.join(
                vdir, os.path.basename(pair.name).replace("/", "_"))
            gt_inl = np.linalg.norm(warped - ldmk_t, axis=1) < 0.04
            visualize_correspondences(ldmk_s, ldmk_t, inlier=gt_inl,
                                      src_pcd=pair.src, tgt_pcd=pair.tgt,
                                      save_path=base + "_corr.png")
            export_correspondences_ply(base + "_corr.ply", ldmk_s, ldmk_t,
                                       inlier=gt_inl)

        row = {"recall_ok": float(err < recall_thr), "trans_err": float(err),
               "IR": ir, "RRE_deg": rre, "RTE": rte,
               "n_matches": float(ldmk_valid.sum()),
               "ransac_inliers": float(inl.sum())}
        for k, v in row.items():
            meters.setdefault(k, AverageMeter()).update(v)
        ledger_fw.write(json.dumps(dict(row, name=pair.name)) + "\n")
        ledger_fw.flush()
        preds.append(pred_T)
        gts.append(gt_T)
        covs.append(cov)

    dt = time.perf_counter() - t0
    recall = registration_recall(preds, gts, covs, threshold=recall_thr)
    msg = (f"{len(ds)} pairs: registration_recall: {recall:.3f}\t"
           + "\t".join(f"{k}: {v.avg:.3f}" for k, v in meters.items()))
    logger.write(msg + "\n")
    print("3DMatch eval\n", msg)
    summary = {"metric": "threedmatch_recall", "value": round(recall, 4),
               "pairs": len(ds), "total_s": round(dt, 2),
               "IR": round(meters["IR"].avg, 4),
               "RRE_deg": round(meters["RRE_deg"].avg, 4),
               "RTE": round(meters["RTE"].avg, 4)}
    logger.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))
    return summary


def main():
    from ..utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--info", default="data/split/3DMatch/test_info.npz")
    ap.add_argument("--base-dir", default="data/split")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--log-dir", default="snapshot/threedmatch")
    ap.add_argument("--ransac-iters", type=int, default=5000)
    ap.add_argument("--ransac-thr", type=float, default=0.05)
    ap.add_argument("--reject-outliers", dest="reject_outliers",
                    action="store_true", default=None)
    ap.add_argument("--no-reject-outliers", dest="reject_outliers",
                    action="store_false")
    ap.add_argument("--visualize", action="store_true",
                    help="save per-pair correspondence renders (GT-inlier "
                         "colored PNG + edge PLY) under <log-dir>/vis/")
    args = ap.parse_args()

    cfg = load_config(args.config)
    reject = (args.reject_outliers if args.reject_outliers is not None
              else cfg.get("reject_outliers", True))
    ldmk_yaml = cfg.get("ldmk_config")
    if ldmk_yaml and os.path.exists(ldmk_yaml):
        from ..match.config_loader import landmark_config_from_yaml

        lcfg = landmark_config_from_yaml(
            ldmk_yaml, inlier_thr=cfg.get("inlier_thr", 0.3),
            reject_outliers=reject)
    else:
        lcfg = LandmarkConfig(inlier_thr=cfg.get("inlier_thr", 0.3),
                              reject_outliers=reject)

    params = init_landmark_model(jax.random.key(0), lcfg)
    if args.weights:
        params = load_pytree(args.weights, params)
    else:
        print("[warn] no --weights: random landmark-model weights "
              "(pipeline validation only)")

    ds = ThreeDMatchDataset(args.info, args.base_dir)
    gt_covs = ds.infos.get("gt_cov")
    if gt_covs is None:
        gt_covs = [np.eye(6)] * len(ds)
    if args.limit is not None:
        ds.infos = {k: v[: args.limit] for k, v in ds.infos.items()}
        gt_covs = gt_covs[: args.limit]

    run_eval_3dmatch(lcfg, params, ds, gt_covs, log_dir=args.log_dir,
                     ransac_iters=args.ransac_iters,
                     ransac_thr=args.ransac_thr, visualize=args.visualize)


if __name__ == "__main__":
    main()
