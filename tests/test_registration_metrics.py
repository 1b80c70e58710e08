"""Tests for RANSAC rigid fitting and registration recall + vis utils."""
import os

import numpy as np

from deformationpyramid_tpu.metrics.registration import (
    ransac_rigid_from_correspondences, registration_recall, to_transform,
    transformation_error,
)
from deformationpyramid_tpu.utils.vis import export_pcds_ply, visualize_pcds
from deformationpyramid_tpu.utils.seed import setup_seed


def test_ransac_recovers_transform_with_outliers():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(200, 3))
    ang = 0.4
    R_gt = np.array([[np.cos(ang), -np.sin(ang), 0],
                     [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t_gt = np.array([0.3, -0.1, 0.2])
    tgt = src @ R_gt.T + t_gt
    # corrupt 40% of correspondences
    n_out = 80
    tgt_noisy = tgt.copy()
    tgt_noisy[:n_out] += rng.normal(size=(n_out, 3)) * 2.0
    R, t, inl = ransac_rigid_from_correspondences(src, tgt_noisy,
                                                  n_iters=1000,
                                                  inlier_thr=0.05)
    assert np.abs(R - R_gt).max() < 1e-3
    assert np.abs(t - t_gt).max() < 1e-3
    assert inl[n_out:].mean() > 0.99 and inl[:n_out].mean() < 0.1


def test_registration_recall_and_error():
    R = np.eye(3)
    gt = to_transform(R, [0, 0, 0])
    close = to_transform(R, [0.05, 0, 0])
    far = to_transform(R, [1.0, 0, 0])
    info = np.eye(6)
    assert transformation_error(np.linalg.inv(close) @ gt, info) < 0.2 ** 2
    assert transformation_error(np.linalg.inv(far) @ gt, info) > 0.2 ** 2
    rr = registration_recall([close, far], [gt, gt], [info, info])
    assert rr == 0.5


def test_vis_outputs(tmp_path):
    setup_seed(0)
    pts = np.random.default_rng(1).normal(size=(100, 3))
    png = visualize_pcds(save_path=str(tmp_path / "v.png"),
                         src_pcd=pts, tgt_pcd=pts + 0.1)
    assert os.path.exists(png)
    ply = str(tmp_path / "v.ply")
    export_pcds_ply(ply, src_pcd=pts, warped_pcd=pts + 0.2)
    with open(ply) as f:
        head = f.read(200)
    assert "element vertex 200" in head
