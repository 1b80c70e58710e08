"""End-to-end ED evaluation from synthetic depth maps."""
import numpy as np

import jax

from deformationpyramid_tpu.cli.eval_ed import evaluate_pair_ed
from deformationpyramid_tpu.data.fourdmatch import Pair
from deformationpyramid_tpu.geometry.camera import depth_to_pointcloud
from deformationpyramid_tpu.solve.baselines import EDSolverConfig
from deformationpyramid_tpu.utils.config import AttrDict


def test_evaluate_pair_ed_synthetic(tmp_path):
    # synthetic source depth (mm) + rigidly shifted target
    h, w = 50, 60
    yy, xx = np.mgrid[0:h, 0:w]
    depth = (1.0 + 0.04 * np.sin(xx / 6.0) * np.cos(yy / 8.0))
    K = np.array([[80.0, 0, 30], [0, 80.0, 25], [0, 0, 1]])
    src_depth_mm = (depth * 1000).astype(np.float32)

    pc = depth_to_pointcloud(depth, K)
    src = pc.reshape(3, -1).T.astype(np.float32)
    shift = np.array([0.1, -0.06, 0.04], np.float32)
    tgt = src + shift

    # target depth map: shifted cloud reprojected is complex; emit a depth
    # map of the shifted surface directly (z shifted)
    tgt_depth_mm = ((depth + shift[2]) * 1000).astype(np.float32)

    sp = tmp_path / "src_depth.npy"
    tp = tmp_path / "tgt_depth.npy"
    np.save(sp, src_depth_mm)
    np.save(tp, tgt_depth_mm)

    pair = Pair(src=src, tgt=tgt, flow_gt=np.tile(shift, (len(src), 1)),
                overlap=np.ones(len(src), bool), rot=np.eye(3, dtype=np.float32),
                trans=np.zeros((3, 1), np.float32),
                correspondences=np.zeros((0, 2), np.int64),
                depth_paths=(str(sp), str(tp)), cam_intrin=K)

    cfg = AttrDict({"max_triangle_distance": 0.1, "node_coverage": 0.12,
                    "num_neighbors": 6})
    scfg = EDSolverConfig(iters=60, samples=256, use_pallas=False)
    flow, flow_gt, overlap = evaluate_pair_ed(pair, cfg, scfg,
                                              jax.random.key(0))
    assert len(flow) > 100
    assert np.isfinite(flow).all()
    assert flow.shape == flow_gt.shape == (len(overlap), 3)
