"""Tests for the point renderer, silhouette cost, p2plane, IR/NRFMR."""
import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.ops.render import (
    RenderConfig, point_2_plane_distance, render_depth_silhouette,
    silhouette_cost,
)
from deformationpyramid_tpu.metrics.matching import inlier_ratio, nrfmr
from deformationpyramid_tpu.data.correspondence_utils import (
    blend_scene_flow, mutual_nn_correspondence,
)

K = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
RC = RenderConfig(height=48, width=64)


def test_render_depth_and_silhouette():
    # one point at image center, z=2
    pts = jnp.array([[0.0, 0.0, 2.0], [0.1, 0.1, 1.0]])
    depth, sil = render_depth_silhouette(pts, K, RC)
    assert float(depth[24, 32]) == 2.0
    # second point: u = 100*0.1/1+32 = 42, v = 34
    assert float(depth[34, 42]) == 1.0
    assert float(sil.sum()) == 2.0


def test_render_zbuffer_takes_nearest():
    pts = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 1.5]])
    depth, _ = render_depth_silhouette(pts, K, RC)
    assert float(depth[24, 32]) == 1.5


def test_silhouette_cost_zero_for_identical():
    rng = np.random.default_rng(0)
    pts = jnp.array(np.stack([rng.uniform(-0.1, 0.1, 200),
                              rng.uniform(-0.1, 0.1, 200),
                              rng.uniform(1.5, 2.0, 200)], 1), jnp.float32)
    c = silhouette_cost(pts, pts, K, RC)
    assert float(c) == 0.0
    # shifted cloud -> positive cost and finite gradient
    shifted = pts + jnp.array([0.3, 0.0, 0.0])
    c2 = silhouette_cost(shifted, pts, K, RC)
    assert float(c2) > 0


def test_point_2_plane_distance():
    # x on the plane z=0 with normals +z; y displaced along z
    x = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    nx = jnp.array([[0.0, 0, 1], [0.0, 0, 1]])
    y = x + jnp.array([0.0, 0, 0.5])
    total, x2p, y2p = point_2_plane_distance(x, y, nx, nx, use_pallas=False)
    assert abs(float(x2p) - 0.5) < 1e-5
    assert abs(float(y2p) - 0.5) < 1e-5


def test_inlier_ratio():
    s = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    t_good = s  # identity gt, zero flow
    valid = jnp.ones((2,), bool)
    ir = inlier_ratio(s, t_good, valid, jnp.eye(3), jnp.zeros((3, 1)),
                      jnp.zeros((2, 3)))
    assert float(ir) == 1.0
    t_bad = s + jnp.array([1.0, 0, 0])
    ir2 = inlier_ratio(s, t_bad, valid, jnp.eye(3), jnp.zeros((3, 1)),
                       jnp.zeros((2, 3)))
    assert float(ir2) == 0.0


def test_nrfmr_perfect_landmarks():
    rng = np.random.default_rng(1)
    pts = jnp.array(rng.normal(size=(50, 3)), jnp.float32)
    flow = jnp.array(np.tile([0.05, 0.0, 0.0], (50, 1)), jnp.float32)
    # landmarks = subset of points with exact flow
    ldmk_s = pts[:20]
    ldmk_t = ldmk_s + flow[:20]
    r = nrfmr(ldmk_s, ldmk_t, jnp.ones((20,), bool), pts, flow)
    assert float(r) == 1.0


def test_nrfmr_search_radius_gates_far_landmarks():
    """A landmark beyond search_radius=0.1 must not contribute to the IDW
    blend (reference blend_anchor_motion, lib/tester.py:12-33)."""
    # metric point at origin, GT flow zero
    pts = jnp.zeros((1, 3), jnp.float32)
    flow_gt = jnp.zeros((1, 3), jnp.float32)
    # two correct landmarks within radius + one WRONG landmark far away
    ldmk_s = jnp.array([[0.02, 0, 0], [0, 0.02, 0], [0.5, 0, 0]], jnp.float32)
    ldmk_t = jnp.array([[0.02, 0, 0], [0, 0.02, 0], [1.5, 0, 0]], jnp.float32)
    valid = jnp.ones((3,), bool)
    # far landmark carries flow 1.0; ungated IDW at dists (.02,.02,.5)
    # gives it weight ~0.0385 -> err ~0.0385 < recall_thr only due to the
    # gating; verify both the recall and the gate directly
    r = nrfmr(ldmk_s, ldmk_t, valid, pts, flow_gt, recall_thr=0.01)
    assert float(r) == 1.0  # gated: blended flow ~0
    r_ungated = nrfmr(ldmk_s, ldmk_t, valid, pts, flow_gt,
                      recall_thr=0.01, search_radius=1e9)
    assert float(r_ungated) == 0.0  # far landmark pollutes the blend

    # reference quirk: ALL anchors out of radius -> uniform 1/k blend and
    # the point STILL counts in the denominator (valid_mask is unused)
    ldmk_s2 = jnp.array([[0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5]], jnp.float32)
    ldmk_t2 = ldmk_s2 + 0.3
    r_far = nrfmr(ldmk_s2, ldmk_t2, valid, pts, flow_gt, recall_thr=0.31)
    # uniform blend of three 0.3-offset flows = [0.3,0.3,0.3], |err|=0.52
    assert float(r_far) == 0.0
    r_far2 = nrfmr(ldmk_s2, ldmk_t2, valid, pts, flow_gt, recall_thr=0.53)
    assert float(r_far2) == 1.0


def test_mutual_nn_and_blend():
    src = np.array([[0.0, 0, 0], [1.0, 0, 0], [5.0, 0, 0]], np.float32)
    tgt = np.array([[0.01, 0, 0], [1.02, 0, 0]], np.float32)
    corr = mutual_nn_correspondence(src, tgt, search_radius=0.1)
    assert {(int(a), int(b)) for a, b in corr} == {(0, 0), (1, 1)}
    flow = np.array([[0.1, 0, 0], [0.2, 0, 0]], np.float32)
    blended = blend_scene_flow(np.array([[0.5, 0, 0]], np.float32),
                               tgt, flow, knn=2)
    assert 0.1 < blended[0, 0] < 0.2
