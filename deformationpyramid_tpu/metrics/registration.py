"""Rigid-registration evaluation: RANSAC fitting and registration recall.

Reference parity: the RANSAC + transformation-error utilities in
``correspondence/lepard/loss.py:13-24`` (``computeTransformationErr``) and
the Open3D-based ``ransac_pose_estimation`` the reference calls for 3DMatch
evaluation. Here: a numpy Kabsch-RANSAC over correspondences (host-side,
runs once per pair) and the covariance-weighted transformation error.
"""
from __future__ import annotations

import numpy as np


def _kabsch(src: np.ndarray, tgt: np.ndarray):
    ms, mt = src.mean(0), tgt.mean(0)
    H = (tgt - mt).T @ (src - ms)
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    S[2, 2] = np.linalg.det(U) * np.linalg.det(Vt.T)
    R = U @ S @ Vt
    t = mt - R @ ms
    return R, t


def ransac_rigid_from_correspondences(src_pts: np.ndarray, tgt_pts: np.ndarray,
                                      n_iters: int = 5000,
                                      inlier_thr: float = 0.05,
                                      sample_size: int = 3, seed: int = 0):
    """RANSAC rigid fit over matched point pairs.

    Returns (R [3,3], t [3], inlier_mask [N]).
    """
    n = len(src_pts)
    if n < sample_size:
        return np.eye(3), np.zeros(3), np.zeros(n, bool)
    rng = np.random.default_rng(seed)
    best_inl = np.zeros(n, bool)
    for _ in range(n_iters):
        idx = rng.choice(n, sample_size, replace=False)
        R, t = _kabsch(src_pts[idx], tgt_pts[idx])
        err = np.linalg.norm(src_pts @ R.T + t - tgt_pts, axis=1)
        inl = err < inlier_thr
        if inl.sum() > best_inl.sum():
            best_inl = inl
    if best_inl.sum() >= sample_size:
        R, t = _kabsch(src_pts[best_inl], tgt_pts[best_inl])
    else:
        R, t = np.eye(3), np.zeros(3)
    return R, t, best_inl


def to_transform(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = np.asarray(t).reshape(3)
    return T


def _mat2quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def transformation_error(trans: np.ndarray, info: np.ndarray) -> float:
    """Covariance-weighted RMSE approximation of a relative transform error
    (``lepard/loss.py:25-43``, redwood-data convention).

    trans: residual 4x4 transform (pred^-1 @ gt); info: 6x6 covariance.
    """
    t = trans[:3, 3]
    q = _mat2quat(trans[:3, :3])
    er = np.concatenate([t, q[1:]])
    return float(er @ info @ er / info[0, 0])


def registration_recall(pred_transforms: list[np.ndarray],
                        gt_transforms: list[np.ndarray],
                        infos: list[np.ndarray],
                        threshold: float = 0.2 ** 2) -> float:
    """Fraction of pairs whose weighted transform error is below threshold
    (3DMatch registration-recall convention)."""
    ok = 0
    for pred, gt, info in zip(pred_transforms, gt_transforms, infos):
        residual = np.linalg.inv(pred) @ gt
        if transformation_error(residual, info) < threshold:
            ok += 1
    return ok / max(len(pred_transforms), 1)
