"""Unit tests for geometry/rotations.py against closed-form cases.

The reference's rotation conversions (``model/rigid_body.py``) are pure
functions; these tests pin their exact semantics (SURVEY.md §4a).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deformationpyramid_tpu.geometry import rotations as rot


def _is_rotation(R, tol=1e-5):
    RtR = np.einsum("...ij,...kj->...ik", R, R)
    eye = np.broadcast_to(np.eye(3), RtR.shape)
    assert np.abs(RtR - eye).max() < tol
    assert np.abs(np.linalg.det(R) - 1.0).max() < tol


def test_skew():
    w = jnp.array([1.0, 2.0, 3.0])
    W = np.asarray(rot.skew(w))
    v = np.array([0.5, -1.0, 2.0])
    assert np.allclose(W @ v, np.cross([1, 2, 3], v), atol=1e-6)
    assert np.allclose(W, -W.T, atol=0)


def test_exp_so3_quarter_turn_z():
    # 90 degrees about z: x axis -> y axis
    w = jnp.array([[0.0, 0.0, 1.0]])
    theta = jnp.array([[np.pi / 2]])
    R = np.asarray(rot.exp_so3(w, theta))[0]
    assert np.allclose(R @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-6)
    _is_rotation(R)


def test_axis_angle_roundtrip_angle():
    rng = np.random.default_rng(0)
    r = jnp.array(rng.normal(size=(64, 3)) * 0.5, jnp.float32)
    R = np.asarray(rot.axis_angle_to_SO3(r))
    _is_rotation(R, tol=1e-4)
    # trace identity: tr(R) = 1 + 2 cos(theta)
    theta = np.linalg.norm(np.asarray(r), axis=-1)
    tr = np.trace(R, axis1=-2, axis2=-1)
    assert np.allclose(tr, 1 + 2 * np.cos(theta), atol=1e-4)


def test_axis_angle_tiny_is_near_identity_no_nan():
    r = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    R = np.asarray(rot.axis_angle_to_SO3(r))
    assert np.isfinite(R).all()
    assert np.abs(R - np.eye(3)).max() < 1e-5


def test_euler_xyz_composition():
    ang = jnp.array([[0.3, -0.2, 0.5]], jnp.float32)
    R = np.asarray(rot.euler_to_SO3(ang))[0]
    _is_rotation(R)
    # matches Rx @ Ry @ Rz
    def rx(a): return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    def ry(a): return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    def rz(a): return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    assert np.allclose(R, rx(0.3) @ ry(-0.2) @ rz(0.5), atol=1e-5)


def test_quaternion_identity_and_z_turn():
    q = jnp.array([[1.0, 0, 0, 0], [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]], jnp.float32)
    R = np.asarray(rot.quaternion_to_SO3(q))
    assert np.allclose(R[0], np.eye(3), atol=1e-6)
    assert np.allclose(R[1] @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-6)


def test_normalize_quaternion_sign_fix():
    q = jnp.array([[-2.0, 0.0, 0.0, 0.0]], jnp.float32)
    qn = np.asarray(rot.normalize_quaternion(q))
    # copysign against q_r < 0 flips the divisor: (-2)/(-2) = 1 scalar part
    assert np.allclose(qn, [[1.0, 0, 0, 0]], atol=1e-6)


def test_sixd_gram_schmidt():
    rng = np.random.default_rng(1)
    d6 = jnp.array(rng.normal(size=(32, 6)), jnp.float32)
    R = np.asarray(rot.sixd_to_SO3(d6))
    _is_rotation(R, tol=1e-4)
    # first row is the normalized first 3-vector
    b1 = np.asarray(d6[:, :3])
    b1 = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
    assert np.allclose(R[:, 0, :], b1, atol=1e-5)


def test_exp_se3_small_theta_limit():
    # p -> I as theta -> 0, so t -> v (callers pass v pre-divided by theta,
    # reference model/nets.py:248-251)
    w = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
    v = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)
    theta = jnp.array([[1e-4]], jnp.float32)
    R, t = rot.exp_se3(w, v, theta)
    assert np.abs(np.asarray(R)[0] - np.eye(3)).max() < 1e-3
    assert np.allclose(np.asarray(t)[0, :, 0], [1.0, 0, 0], atol=1e-4)


def test_grad_through_axis_angle():
    def f(r):
        R = rot.axis_angle_to_SO3(r[None])[0]
        return jnp.sum(R @ jnp.array([1.0, 0.0, 0.0]))
    g = jax.grad(f)(jnp.array([1e-3, 2e-3, -1e-3], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


def test_rotate_axis_angle_matches_matrix_form():
    rng = np.random.default_rng(9)
    r = jnp.array(rng.normal(size=(64, 3)) * 0.8, jnp.float32)
    x = jnp.array(rng.normal(size=(64, 3)), jnp.float32)
    want = np.einsum("nij,nj->ni", np.asarray(rot.axis_angle_to_SO3(r)),
                     np.asarray(x))
    got = np.asarray(rot.rotate_axis_angle(r, x))
    assert np.allclose(got, want, atol=1e-5)
