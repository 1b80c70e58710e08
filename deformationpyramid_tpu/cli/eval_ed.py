"""ED / N-ICP evaluation from raw depth maps.

TPU re-design of the reference's ED branch (``eval_nolearned.py:113-127``):
for each pair, build a deformation graph from the source depth map (host,
``data/graph.py``), back-project the target depth, run the compiled ED
solver, and propagate motion to the sampled evaluation points through the
pixel map (``registration.py:461-467``).

Usage:
  python -m deformationpyramid_tpu.cli.eval_ed --config config/baselines/NICP.yaml
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data.fourdmatch import FourDMatchDataset
from ..data.graph import build_deformation_graph_from_depth
from ..geometry.camera import depth_to_pointcloud, map_pixel_to_pcd, pointcloud_to_uv
from ..metrics.flow import compute_flow_metrics
from ..solve.baselines import EDSolverConfig, register_ed
from ..utils.config import load_config
from ..utils.logging import AverageMeter, Logger
from ..utils.timers import Timers


def _read_depth(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    try:
        import imageio.v3 as iio

        return np.asarray(iio.imread(path), np.float32)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path), np.float32)


def evaluate_pair_ed(pair, cfg, scfg: EDSolverConfig, key):
    """Returns (flow, flow_gt, overlap) on the valid evaluated points."""
    src_depth = _read_depth(pair.depth_paths[0])
    tgt_depth = _read_depth(pair.depth_paths[1]) / 1000.0
    K = pair.cam_intrin

    g = build_deformation_graph_from_depth(
        src_depth, K,
        max_triangle_distance=cfg.get("max_triangle_distance", 0.06),
        node_coverage=cfg.get("node_coverage", 0.09),
        n_max_neighbors=cfg.get("num_neighbors", 8))

    tgt_pc_img = depth_to_pointcloud(tgt_depth, K)
    tgt_mask = tgt_depth > 0
    tgt_pcd = tgt_pc_img.reshape(3, -1).T[tgt_mask.reshape(-1)].astype(np.float32)

    warped, stats = jax.jit(lambda k, s, t: register_ed(
        k, s, t, jnp.array(g.nodes), jnp.array(g.edges),
        jnp.array(g.edge_weights), jnp.array(g.point_anchors),
        jnp.array(g.anchor_weights), scfg,
        edges_valid=jnp.array(g.edges_valid)))(
        key, jnp.array(g.vertices), jnp.array(tgt_pcd))
    warped = np.asarray(warped)

    # propagate motion to the sampled evaluation points via the pixel map
    h, w = src_depth.shape
    valid_pix = np.zeros((h, w), bool)
    valid_pix[g.vertex_pixels[:, 1], g.vertex_pixels[:, 0]] = True
    pix2pcd = map_pixel_to_pcd(valid_pix)
    uv = pointcloud_to_uv(pair.src, K)
    inside = (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
    sid = np.full(len(pair.src), -1, np.int64)
    sid[inside] = pix2pcd[uv[inside, 1], uv[inside, 0]]
    valid = sid > -1
    flow = warped[sid[valid]] - pair.src[valid]
    return flow, pair.flow_gt[valid], pair.overlap[valid]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--splits", nargs="*", default=["4DMatch-F", "4DLoMatch-F"])
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    cfg = load_config(args.config)
    scfg = EDSolverConfig(
        iters=cfg.get("iters", 600), lr=cfg.get("lr", 0.02),
        max_break_count=cfg.get("max_break_count", 30),
        break_threshold_ratio=cfg.get("break_threshold_ratio", 0.01),
        samples=cfg.get("samples", 2000),
        w_cd=cfg.get("w_cd", 1.0), w_arap=cfg.get("w_arap", 0.5),
        w_ldmk=cfg.get("w_ldmk", 1.0))
    timers = Timers()
    key = jax.random.key(0)

    for split in args.splits:
        ds = FourDMatchDataset(cfg.data_root, split)
        if args.limit:
            ds.entries = ds.entries[: args.limit]
        meters: dict[str, AverageMeter] = {}
        n = 0
        for i in range(len(ds)):
            pair = ds[i]
            if pair.depth_paths is None or pair.cam_intrin is None:
                continue
            key, sub = jax.random.split(key)
            timers.tic("graph+registration")
            flow, flow_gt, overlap = evaluate_pair_ed(pair, cfg, scfg, sub)
            timers.toc("graph+registration")
            m = compute_flow_metrics(jnp.array(flow), jnp.array(flow_gt),
                                     overlap=jnp.array(overlap))
            for k2, v in m.items():
                meters.setdefault(k2, AverageMeter()).update(float(v))
            n += 1
        if n:
            msg = f"{n} pairs: " + "\t".join(
                f"{k}: {v.avg:.3f}" for k, v in meters.items())
            print("score on", split, "\n", msg)
        else:
            print(f"[skip] {split}: no pairs with depth maps")
    for line in timers.get_strings():
        print(line)


if __name__ == "__main__":
    main()
