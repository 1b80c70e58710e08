"""Tests for kabsch rigid fit, ED warp, camera geometry, sinkhorn op."""
import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.geometry.kabsch import rigid_fit, ed_warp
from deformationpyramid_tpu.geometry.camera import (
    depth_to_pointcloud, pointcloud_to_uv, map_pixel_to_pcd,
)
from deformationpyramid_tpu.geometry.rotations import axis_angle_to_SO3
from deformationpyramid_tpu.ops.sinkhorn import sinkhorn_divergence


def test_rigid_fit_recovers_known_transform():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(1, 50, 3)).astype(np.float32)
    R_gt = np.asarray(axis_angle_to_SO3(jnp.array([[0.3, -0.1, 0.2]])))[0]
    t_gt = np.array([0.5, -0.2, 0.1], np.float32)
    Y = X @ R_gt.T + t_gt
    w = np.ones((1, 50, 1), np.float32)
    R, t = rigid_fit(jnp.array(X), jnp.array(Y), jnp.array(w))
    assert np.allclose(np.asarray(R)[0], R_gt, atol=1e-4)
    assert np.allclose(np.asarray(t)[0, :, 0], t_gt, atol=1e-4)


def test_rigid_fit_weighted_ignores_outliers():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(1, 40, 3)).astype(np.float32)
    t_gt = np.array([1.0, 0.0, 0.0], np.float32)
    Y = X + t_gt
    Y[0, :5] += 50.0  # corrupted correspondences
    w = np.ones((1, 40, 1), np.float32)
    w[0, :5] = 0.0
    R, t = rigid_fit(jnp.array(X), jnp.array(Y), jnp.array(w))
    assert np.allclose(np.asarray(R)[0], np.eye(3), atol=1e-3)
    assert np.allclose(np.asarray(t)[0, :, 0], t_gt, atol=1e-3)


def test_ed_warp_identity_graph():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(20, 3)).astype(np.float32)
    g = rng.normal(size=(20, 4, 3)).astype(np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (20, 4, 3, 3))
    t = np.zeros((20, 4, 3), np.float32)
    w = np.full((20, 4), 0.25, np.float32)
    y = ed_warp(jnp.array(x), jnp.array(g), jnp.array(R), jnp.array(t), jnp.array(w))
    assert np.allclose(np.asarray(y), x, atol=1e-6)


def test_ed_warp_pure_translation():
    x = np.zeros((5, 3), np.float32)
    g = np.zeros((5, 2, 3), np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (5, 2, 3, 3))
    t = np.ones((5, 2, 3), np.float32) * np.array([1, 2, 3], np.float32)
    w = np.full((5, 2), 0.5, np.float32)
    y = ed_warp(jnp.array(x), jnp.array(g), jnp.array(R), jnp.array(t), jnp.array(w))
    assert np.allclose(np.asarray(y), np.tile([1, 2, 3], (5, 1)), atol=1e-6)


def test_depth_roundtrip():
    K = np.array([[500.0, 0, 32], [0, 500.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 2.0)
    pc = depth_to_pointcloud(depth, K)  # [3, H, W]
    pts = pc.reshape(3, -1).T
    uv = pointcloud_to_uv(pts, K)
    u = np.arange(64)[None, :].repeat(48, 0).reshape(-1)
    v = np.arange(48)[:, None].repeat(64, 1).reshape(-1)
    assert (uv[:, 0] == u).all() and (uv[:, 1] == v).all()


def test_map_pixel_to_pcd():
    mask = np.array([[True, False], [True, True]])
    m = map_pixel_to_pcd(mask)
    assert m[0, 0] == 0 and m[0, 1] == -1 and m[1, 0] == 1 and m[1, 1] == 2


def test_sinkhorn_divergence_properties():
    rng = np.random.default_rng(3)
    x = jnp.array(rng.normal(size=(64, 3)), jnp.float32)
    y = jnp.array(rng.normal(size=(64, 3)) + 1.0, jnp.float32)
    d_xy = float(sinkhorn_divergence(x, y, blur=0.1, reach=None, n_iters=15))
    d_xx = float(sinkhorn_divergence(x, x, blur=0.1, reach=None, n_iters=15))
    # debiased divergence: ~0 at equality, positive apart
    assert abs(d_xx) < 5e-3
    assert d_xy > 0.1
    # gradient points roughly from x toward y (descent decreases divergence)
    g = jax.grad(lambda x_: sinkhorn_divergence(x_, y, blur=0.1, reach=None,
                                                n_iters=15))(x)
    x2 = x - 0.5 * 64 * g
    d2 = float(sinkhorn_divergence(x2, y, blur=0.1, reach=None, n_iters=15))
    assert d2 < d_xy
