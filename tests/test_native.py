"""Native C++ ops vs the numpy/scipy reference implementations."""
import numpy as np
import pytest

from deformationpyramid_tpu import native
from deformationpyramid_tpu.data.collate import grid_subsample, radius_search
from deformationpyramid_tpu.data.graph import (
    build_deformation_graph_from_depth, compute_clusters, depth_to_mesh,
    erode_mesh, node_and_edge_clean_up, sample_nodes,
)

needs_native = pytest.mark.skipif(not native.has_native(),
                                  reason="dp_native not built")


@needs_native
def test_native_grid_subsample_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    got = native.grid_subsample(pts, 0.3)
    ref, _ = grid_subsample(pts, 0.3)
    # same voxel set (order-insensitive compare via sorting rows)
    assert got.shape == ref.shape
    gs = got[np.lexsort(got.T)]
    rs = ref[np.lexsort(ref.T)]
    assert np.allclose(gs, rs, atol=1e-5)


@needs_native
def test_native_radius_neighbors_matches_kdtree():
    rng = np.random.default_rng(1)
    sup = rng.normal(size=(500, 3)).astype(np.float32)
    q = rng.normal(size=(100, 3)).astype(np.float32)
    got = native.radius_neighbors(q, sup, 0.4, 12)
    ref = radius_search(q, sup, 0.4, 12)
    # shadow positions identical; neighbor sets identical; order by distance
    assert got.shape == ref.shape
    assert ((got == 500) == (ref == 500)).all()
    for i in range(len(q)):
        assert set(got[i][got[i] < 500]) == set(ref[i][ref[i] < 500])
        d = np.linalg.norm(sup[got[i][got[i] < 500]] - q[i], axis=1)
        assert (np.diff(d) >= -1e-6).all()


# ---------------- deformation graph (numpy/scipy path) ----------------

def synthetic_depth(h=60, w=80):
    """Smooth bumpy surface at ~1m with a hole."""
    yy, xx = np.mgrid[0:h, 0:w]
    depth = 1.0 + 0.05 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
    depth[20:28, 30:40] = 0.0  # invalid hole
    return (depth * 1000).astype(np.float32)  # millimeters


K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]])


def test_depth_to_mesh_filters_long_edges():
    depth = synthetic_depth()
    v, f, vp = depth_to_mesh(depth, K, max_triangle_distance=0.06,
                             depth_scale=1000.0)
    assert len(v) == (depth > 0).sum()
    assert len(f) > 0
    # every triangle edge shorter than the cap
    e = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1)
    assert e.max() <= 0.06 + 1e-6
    # hole pixels are not vertices
    assert not ((vp[:, 0] >= 30) & (vp[:, 0] < 40) &
                (vp[:, 1] >= 20) & (vp[:, 1] < 28)).any()


def test_graph_pipeline_end_to_end():
    depth = synthetic_depth()
    g = build_deformation_graph_from_depth(
        depth, K, max_triangle_distance=0.06, node_coverage=0.1,
        n_max_neighbors=6, n_anchors=4)
    m = len(g.nodes)
    assert m > 4
    # nodes respect coverage spacing
    d = np.linalg.norm(g.nodes[:, None] - g.nodes[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.1 * 0.99
    # anchors normalized
    assert np.allclose(g.anchor_weights.sum(1), 1.0, atol=1e-5)
    assert (g.point_anchors < m).all()
    # edges mostly valid, weights in (0, 1]
    assert g.edges_valid.any()
    w = g.edge_weights[g.edges_valid]
    assert ((w > 0) & (w <= 1.0 + 1e-6)).all()
    # cleanup + clusters run
    keep = node_and_edge_clean_up(g.edges_valid)
    labels = compute_clusters(g.edges, g.edges_valid)
    assert keep.shape == (m,) and labels.shape == (m,)


def test_ed_solver_with_real_graph():
    """Depth graph -> jitted ED registration on a translated copy."""
    import jax
    import jax.numpy as jnp
    from deformationpyramid_tpu.solve.baselines import EDSolverConfig, register_ed

    depth = synthetic_depth()
    g = build_deformation_graph_from_depth(
        depth, K, node_coverage=0.15, n_max_neighbors=6, n_anchors=4)
    src = g.vertices
    # offset must exceed the chamfer sampling resolution (~sqrt(area/samples))
    tgt = (src + np.array([0.12, -0.08, 0.05], np.float32))
    cfg = EDSolverConfig(iters=200, samples=512, use_pallas=False)
    warped, stats = jax.jit(lambda k, s, t: register_ed(
        k, s, t, jnp.array(g.nodes), jnp.array(g.edges),
        jnp.array(g.edge_weights), jnp.array(g.point_anchors),
        jnp.array(g.anchor_weights), cfg,
        edges_valid=jnp.array(g.edges_valid)))(
        jax.random.key(0), jnp.array(src), jnp.array(tgt))
    err = np.linalg.norm(np.asarray(warped) - tgt, axis=1).mean()
    err0 = np.linalg.norm(src - tgt, axis=1).mean()
    assert err < 0.3 * err0, (err0, err)
