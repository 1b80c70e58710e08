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


def _nearest_indices(query: np.ndarray, pts: np.ndarray,
                     chunk: int = 1024) -> np.ndarray:
    out = np.empty(len(query), np.int64)
    for s in range(0, len(query), chunk):
        d2 = ((query[s:s + chunk, None] - pts[None]) ** 2).sum(-1)
        out[s:s + chunk] = d2.argmin(1)
    return out


def evaluate_pair_ed(pair, cfg, scfg: EDSolverConfig, key, landmark_fn=None,
                     vis_dir: str | None = None):
    """Returns (flow, flow_gt, overlap) on the valid evaluated points.

    ``landmark_fn(src_pts, tgt_pts) -> (ldmk_s, ldmk_t, valid)`` enables the
    landmark-guided ED path (Lepard+NICP): landmark coordinates are mapped
    to the nearest raw-cloud indices, the analogue of the reference's
    uv -> pcd-index mapping (``registration.py:81-88``).
    """
    src_depth = _read_depth(pair.depth_paths[0])
    tgt_depth = _read_depth(pair.depth_paths[1]) / 1000.0
    K = pair.cam_intrin

    g = build_deformation_graph_from_depth(
        src_depth, K,
        max_triangle_distance=cfg.get("max_triangle_distance", 0.06),
        node_coverage=cfg.get("node_coverage", 0.09),
        n_max_neighbors=cfg.get("num_neighbors", 8),
        remove_sparse_nodes=cfg.get(
            "REMOVE_NODES_WITH_NOT_ENOUGH_NEIGHBORS", True))

    if vis_dir is not None:
        # deformation-graph render (nodes + kNN edges over the eroded
        # source surface), PNG + edge PLY — the ED-path debugging view
        # (reference utils/vis.py node_o3d_spheres + graph draws)
        from ..utils.vis import export_graph_ply, visualize_graph

        os.makedirs(vis_dir, exist_ok=True)
        base = os.path.join(vis_dir, pair.name.replace("/", "_"))
        visualize_graph(g.nodes, g.edges, edges_valid=g.edges_valid,
                        pcd=g.vertices, save_path=base + "_graph.png")
        export_graph_ply(base + "_graph.ply", g.nodes, g.edges,
                         edges_valid=g.edges_valid)

    tgt_pc_img = depth_to_pointcloud(tgt_depth, K)
    tgt_mask = tgt_depth > 0
    tgt_pcd = tgt_pc_img.reshape(3, -1).T[tgt_mask.reshape(-1)].astype(np.float32)

    ldmk_kwargs = {}
    if landmark_fn is not None:
        ldmk_s, ldmk_t, lvalid = landmark_fn(g.vertices, tgt_pcd)
        keep = np.asarray(lvalid)
        s_idx = _nearest_indices(np.asarray(ldmk_s), g.vertices)
        t_idx = _nearest_indices(np.asarray(ldmk_t), tgt_pcd)
        ldmk_kwargs = dict(src_ldmk_idx=jnp.array(s_idx),
                           tgt_ldmk_idx=jnp.array(t_idx),
                           ldmk_valid=jnp.array(keep))

    warped, stats = jax.jit(lambda k, s, t, **lk: register_ed(
        k, s, t, jnp.array(g.nodes), jnp.array(g.edges),
        jnp.array(g.edge_weights), jnp.array(g.point_anchors),
        jnp.array(g.anchor_weights), scfg,
        edges_valid=jnp.array(g.edges_valid), **lk))(
        key, jnp.array(g.vertices), jnp.array(tgt_pcd), **ldmk_kwargs)
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


def make_landmark_fn(cfg, weights: str | None = None):
    """Landmark provider for the Lepard+NICP path
    (``config/baselines/Lepard+NICP.yaml``): Lepard matcher + NeCo outlier
    rejection on the raw clouds, returning (ldmk_s, ldmk_t, valid)."""
    from ..data.collate import build_pair_pyramid, calibrate_neighborhood_limits
    from ..match.backbone import KPFCN_ARCHITECTURE
    from ..match.landmark import (
        LandmarkConfig, init_landmark_model, landmark_inference,
    )
    from ..utils.checkpoint import load_pytree

    ldmk_yaml = cfg.get("ldmk_config")
    if ldmk_yaml and os.path.exists(ldmk_yaml):
        from ..match.config_loader import landmark_config_from_yaml

        lcfg = landmark_config_from_yaml(
            ldmk_yaml, inlier_thr=cfg.get("inlier_thr", 0.5),
            reject_outliers=cfg.get("reject_outliers", True))
    else:
        lcfg = LandmarkConfig(inlier_thr=cfg.get("inlier_thr", 0.5),
                              reject_outliers=cfg.get("reject_outliers", True))
    params = init_landmark_model(jax.random.key(0), lcfg)
    if weights:
        params = load_pytree(weights, params)

    ldmk_jit = jax.jit(lambda p, pyr, sl, tl: landmark_inference(
        p, pyr, sl, tl, lcfg))
    state: dict = {}

    def landmark_fn(src_pts: np.ndarray, tgt_pts: np.ndarray):
        if "limits" not in state:
            state["limits"] = calibrate_neighborhood_limits(
                [(src_pts, tgt_pts)], lcfg.matcher.kpfcn, KPFCN_ARCHITECTURE)
        pyr = build_pair_pyramid(src_pts, tgt_pts, lcfg.matcher.kpfcn,
                                 KPFCN_ARCHITECTURE, state["limits"])
        pyrd = {"points": [jnp.array(p) for p in pyr.points],
                "valids": [jnp.array(v) for v in pyr.valids],
                "neighbors": [jnp.array(x) for x in pyr.neighbors],
                "pools": [jnp.array(x) for x in pyr.pools],
                "upsamples": [jnp.array(x) for x in pyr.upsamples],
                "features": jnp.array(pyr.features)}
        cl = lcfg.matcher.coarse_level
        data = ldmk_jit(params, pyrd, jnp.int32(pyr.src_lengths[cl]),
                        jnp.int32(pyr.tgt_lengths[cl]))
        return (np.asarray(data["ldmk_s"]), np.asarray(data["ldmk_t"]),
                np.asarray(data["ldmk_valid"]))

    return landmark_fn


def main():
    from ..utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--splits", nargs="*", default=["4DMatch-F", "4DLoMatch-F"])
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--weights", default=None,
                    help="npz checkpoint of the landmark model")
    ap.add_argument("--visualize", action="store_true",
                    help="save per-pair deformation-graph renders "
                         "(PNG + edge PLY) under <log-dir>/vis/")
    ap.add_argument("--log-dir", default="snapshot/ed")
    args = ap.parse_args()

    cfg = load_config(args.config)
    landmark_fn = make_landmark_fn(cfg, args.weights) \
        if cfg.get("use_ldmk", False) else None
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
            flow, flow_gt, overlap = evaluate_pair_ed(
                pair, cfg, scfg, sub, landmark_fn=landmark_fn,
                vis_dir=(os.path.join(args.log_dir, "vis")
                         if args.visualize else None))
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
