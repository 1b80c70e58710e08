"""Shape-transfer demo surface (``cli/shape_transfer.py``), CPU.

The reference demo (``/root/reference/shape_transfer.py:104-168``) fits a
Sim3 pyramid on sampled surface points and warps the raw mesh vertices;
these tests exercise the same ``register_meshes`` entry on tiny synthetic
clouds: the fit must move the source toward the target and the vertex
warp must ride the fitted pyramid (not the sample subset).
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from deformationpyramid_tpu.cli.shape_transfer import (DEMO_CFG,
                                                       register_meshes)
from deformationpyramid_tpu.models.pyramid import NDPConfig
from deformationpyramid_tpu.solve.registration import SolverConfig


def _clouds(n=400, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    # rigid-ish target: small rotation + scale + offset (Sim3-shaped)
    ang = 0.15
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    tgt = 1.05 * src @ rot.T + np.array([0.4, -0.2, 0.1], np.float32)
    return src, tgt


def _nn_dist(a, b):
    d = np.linalg.norm(a[:, None] - b[None], axis=-1)
    return float(d.min(axis=1).mean())


@pytest.fixture(scope="module")
def small_cfg():
    return dataclasses.replace(
        DEMO_CFG,
        pyramid=NDPConfig(m=3, k0=-6, depth=3, width=128,
                          rotation_format="euler", motion="Sim3"),
        iters=60, samples=400)


def test_register_meshes_converges(small_cfg):
    src, tgt = _clouds()
    verts = src[:150]  # "mesh vertices": a subset not equal to the samples
    warped, stats = register_meshes(src, tgt, verts, small_cfg, seed=0)
    warped = np.asarray(warped)
    assert warped.shape == verts.shape
    before = _nn_dist(verts, tgt)
    after = _nn_dist(warped, tgt)
    assert after < 0.5 * before, (before, after)
    # stats carry one entry per pyramid level
    assert np.asarray(stats["iters"]).shape == (3,)
    assert np.asarray(stats["loss"]).shape == (3,)


def test_register_meshes_translates_into_target_frame(small_cfg):
    # pure translation: the mean-centering + tgt_mean re-add must land the
    # warped vertices on the target even before the pyramid does anything
    src, _ = _clouds(seed=1)
    tgt = src + np.array([1.0, 2.0, -3.0], np.float32)
    cfg = dataclasses.replace(small_cfg, iters=1)
    warped, _ = register_meshes(src, tgt, src, cfg, seed=0)
    np.testing.assert_allclose(np.asarray(warped), tgt, atol=0.05)


def test_fused_default_gates_on_backend(monkeypatch, small_cfg):
    # on CPU the auto default stays unfused; DP_FUSED_ITER=1 opts in and
    # the fused (interpret-mode) path must still converge
    import jax

    assert jax.default_backend() == "cpu"
    src, tgt = _clouds(seed=2, n=200)
    monkeypatch.setenv("DP_FUSED_ITER", "1")
    cfg = dataclasses.replace(small_cfg, iters=25, samples=200)
    warped, _ = register_meshes(src, tgt, src[:60], cfg, seed=0)
    before = _nn_dist(src[:60], tgt)
    after = _nn_dist(np.asarray(warped), tgt)
    assert after < before, (before, after)
