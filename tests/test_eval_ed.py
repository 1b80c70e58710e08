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
                                              jax.random.key(0),
                                              vis_dir=str(tmp_path / "vis"))
    assert len(flow) > 100
    assert np.isfinite(flow).all()
    assert flow.shape == flow_gt.shape == (len(overlap), 3)
    # --visualize artifact: deformation-graph PNG + edge PLY
    assert (tmp_path / "vis" / "_graph.png").stat().st_size > 1000
    hdr = (tmp_path / "vis" / "_graph.ply").read_text().split("end_header")[0]
    assert "element edge" in hdr and "element vertex" in hdr


def test_evaluate_pair_ed_with_landmarks(tmp_path):
    """Lepard+NICP path: a landmark_fn feeds coordinate landmarks that are
    mapped to raw-cloud indices and pulled into the ED objective."""
    h, w = 40, 48
    yy, xx = np.mgrid[0:h, 0:w]
    depth = (1.0 + 0.04 * np.sin(xx / 6.0) * np.cos(yy / 8.0))
    K = np.array([[70.0, 0, 24], [0, 70.0, 20], [0, 0, 1]])
    np.save(tmp_path / "s.npy", (depth * 1000).astype(np.float32))
    shift = np.array([0.08, -0.05, 0.03], np.float32)
    np.save(tmp_path / "t.npy", ((depth + shift[2]) * 1000).astype(np.float32))

    pc = depth_to_pointcloud(depth, K)
    src = pc.reshape(3, -1).T.astype(np.float32)
    tgt = src + shift
    pair = Pair(src=src, tgt=tgt, flow_gt=np.tile(shift, (len(src), 1)),
                overlap=np.ones(len(src), bool),
                rot=np.eye(3, dtype=np.float32),
                trans=np.zeros((3, 1), np.float32),
                correspondences=np.zeros((0, 2), np.int64),
                depth_paths=(str(tmp_path / "s.npy"), str(tmp_path / "t.npy")),
                cam_intrin=K)

    calls = {}

    def landmark_fn(src_pts, tgt_pts):
        # oracle landmarks: a few src vertices and their shifted positions
        calls["src_shape"] = src_pts.shape
        rng = np.random.default_rng(0)
        pick = rng.permutation(len(src_pts))[:16]
        return (src_pts[pick], src_pts[pick] + shift, np.ones(16, bool))

    cfg = AttrDict({"max_triangle_distance": 0.1, "node_coverage": 0.12,
                    "num_neighbors": 6})
    # Lepard+NICP weighting: landmarks dominate, chamfer small (w_cd 0.1).
    # The synthetic target depth map only observes the z component of the
    # shift, so the x/y motion is recoverable ONLY through the landmarks.
    scfg = EDSolverConfig(iters=150, samples=256, use_pallas=False,
                          w_ldmk=1.0, w_cd=0.1)
    flow, flow_gt, overlap = evaluate_pair_ed(pair, cfg, scfg,
                                              jax.random.key(0),
                                              landmark_fn=landmark_fn)
    assert calls["src_shape"][1] == 3
    assert np.isfinite(flow).all()
    flow0, _, _ = evaluate_pair_ed(pair, cfg, scfg, jax.random.key(0))
    err = np.linalg.norm(flow - flow_gt, axis=1).mean()
    err_no = np.linalg.norm(flow0 - flow_gt, axis=1).mean()
    err0 = np.linalg.norm(flow_gt, axis=1).mean()
    assert err < 0.6 * err_no, (err, err_no)
    assert err < 0.5 * err0, (err, err0)
