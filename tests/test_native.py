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


# ---------------- euclidean graph path (graph_proc.cpp:312-994) ----------

def test_compute_edges_euclidean_vs_bruteforce():
    from deformationpyramid_tpu.data.graph import compute_edges_euclidean

    rng = np.random.default_rng(0)
    nodes = rng.normal(size=(40, 3)).astype(np.float32) * 0.2
    k, max_inf = 6, 0.05  # squared-distance cutoff (reference quirk)
    edges = compute_edges_euclidean(nodes, k, max_inf)
    assert edges.shape == (40, k)
    for i in range(40):
        d2 = ((nodes - nodes[i]) ** 2).sum(1)
        d2[i] = np.inf
        cand = np.nonzero(d2 <= max_inf)[0]
        want = cand[np.argsort(d2[cand])][:k]
        got = edges[i][edges[i] >= 0]
        assert list(got) == list(want)
        # distance-ordered
        assert (np.diff(d2[got]) >= -1e-12).all()
        # padding only at the tail
        tail = edges[i][len(got):]
        assert (tail == -1).all()


def test_pixel_anchors_euclidean_vs_bruteforce():
    from deformationpyramid_tpu.data.graph import compute_pixel_anchors_euclidean

    rng = np.random.default_rng(1)
    nodes = rng.normal(size=(9, 3)).astype(np.float32)
    nodes[:, 2] = np.abs(nodes[:, 2]) + 0.5
    pimg = rng.normal(size=(6, 7, 3)).astype(np.float32)
    pimg[..., 2] = np.abs(pimg[..., 2]) + 0.5
    pimg[2, 3, 2] = 0.0   # invalid pixel
    cov = 0.3
    anchors, weights = compute_pixel_anchors_euclidean(nodes, pimg, cov,
                                                       n_anchors=4, chunk=5)
    assert anchors.shape == (6, 7, 4) and weights.shape == (6, 7, 4)
    assert (anchors[2, 3] == -1).all() and (weights[2, 3] == 0).all()
    for y in range(6):
        for x in range(7):
            if pimg[y, x, 2] <= 0:
                continue
            d2 = ((nodes - pimg[y, x]) ** 2).sum(1)
            want = np.argsort(d2)[:4]
            assert list(anchors[y, x]) == list(want)
            w = np.exp(-d2[want] / (2 * cov ** 2))
            w = w / w.sum()
            assert np.allclose(weights[y, x], w, atol=1e-5)


def test_cleanup_remap_edges_and_anchors():
    from deformationpyramid_tpu.data.graph import (
        node_id_mapping_from_mask, remap_edges_after_cleanup,
        update_pixel_anchors,
    )

    # node 1 gets deleted; nodes 0,2,3 survive -> new ids 0,1,2
    edges = np.array([[1, 2, 0], [0, 2, 1], [3, 1, 2], [2, 0, 3]])
    ew = np.array([[.5, .3, 0], [.4, .6, 0], [.2, .8, 0], [.7, .3, 0]],
                  np.float32)
    ev = np.array([[1, 1, 0], [1, 1, 0], [1, 1, 0], [1, 1, 0]], bool)
    keep = np.array([True, False, True, True])
    mapping = node_id_mapping_from_mask(keep)
    assert list(mapping) == [0, -1, 1, 2]

    e2, w2, v2 = remap_edges_after_cleanup(edges, ew, ev, keep)
    assert e2.shape == (3, 3)
    # node 0: [1(del), 2, ...] -> [new(2)=1]; weight renormalized to 1
    assert list(e2[0][v2[0]]) == [1]
    assert np.allclose(w2[0][v2[0]], [1.0])
    # node 2 (new 1): [3, 1(del), ...] -> [new(3)=2]
    assert list(e2[1][v2[1]]) == [2]
    # node 3 (new 2): [2, 0] -> [1, 0], weights .7/.3 unchanged (sum 1)
    assert list(e2[2][v2[2]]) == [1, 0]
    assert np.allclose(w2[2][v2[2]], [.7, .3])
    # invalid slots self-looped for safe gathers
    assert (e2[~v2] == np.repeat(np.arange(3), 3).reshape(3, 3)[~v2]).all()

    anchors = np.array([[0, 1, 2, 3], [1, 1, -1, 0]])
    got = update_pixel_anchors(mapping, anchors)
    assert list(got[0]) == [0, -1, 1, 2]
    assert list(got[1]) == [-1, -1, -1, 0]


def test_driver_cleanup_consumes_keep_mask():
    """build_deformation_graph_from_depth(remove_sparse_nodes=True) must
    return a self-consistent remapped graph vs the raw (False) one."""
    depth = synthetic_depth()
    # isolated valid island, geodesically disconnected from the surface:
    # its node(s) have <2 finite-geodesic edges and must be cleaned up
    # (large enough to survive 4 erosion rounds; z offset beats coverage)
    depth[35:58, 50:78] = 0.0
    depth[39:54, 54:74] = 700.0
    g_raw = build_deformation_graph_from_depth(
        depth, K, node_coverage=0.12, n_max_neighbors=2, n_anchors=4,
        remove_sparse_nodes=False)
    g = build_deformation_graph_from_depth(
        depth, K, node_coverage=0.12, n_max_neighbors=2, n_anchors=4,
        remove_sparse_nodes=True)
    keep = node_and_edge_clean_up(g_raw.edges_valid)
    assert not keep.all(), "expected the island node to be deleted"
    assert len(g.nodes) == int(keep.sum())
    assert np.allclose(g.nodes, g_raw.nodes[keep])
    m = len(g.nodes)
    # all ids in range, anchors reference surviving nodes or -1
    assert (g.edges[g.edges_valid] < m).all() and (g.edges >= 0).all()
    assert (g.point_anchors < m).all() and (g.point_anchors >= -1).all()
    # surviving rows' edge weights are renormalized to sum 1
    rows = g.edges_valid.any(1)
    assert np.allclose(g.edge_weights[rows].sum(1), 1.0, atol=1e-5)
    assert g.clusters is not None and g.clusters.shape == (m,)
    # brute-force anchor check: for each reachable vertex the top anchor is
    # the geodesically-nearest SURVIVING node, with the id remapped
    from deformationpyramid_tpu.data.graph import (
        compute_edges_geodesic, node_id_mapping_from_mask,
    )
    from deformationpyramid_tpu.data.graph import depth_to_mesh, erode_mesh, sample_nodes
    vertices, faces, _ = depth_to_mesh(depth, K, 0.06, 1000.0)
    keep_v = erode_mesh(vertices, faces)
    node_idx = sample_nodes(vertices, keep_v, 0.12)
    _, _, _, n2v = compute_edges_geodesic(vertices, faces, node_idx, 2, 0.12)
    mapping = node_id_mapping_from_mask(keep)
    d = np.where(keep[:, None], n2v, np.inf).T   # [N, M] surviving only
    reachable = np.isfinite(d).any(1)
    want_top = mapping[np.argmin(d[reachable], axis=1)]
    assert (g.point_anchors[reachable, 0] == want_top).all()


def test_construct_regular_graph_plane_and_hole():
    from deformationpyramid_tpu.data.graph import construct_regular_graph

    h, w = 9, 9
    pimg = np.zeros((h, w, 3), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    pimg[..., 0] = xx * 0.1
    pimg[..., 1] = yy * 0.1
    pimg[..., 2] = 1.0
    pimg[0:3, 6:9, 2] = 0.0   # invalid corner region
    nodes, edges, anchors, weights = construct_regular_graph(
        pimg, x_nodes=5, y_nodes=5, edge_threshold=1.0,
        max_point_to_node_distance=1.0, max_depth=10.0)
    # grid nodes at pixels 0,2,4,6,8; the hole kills (y,x) grid nodes
    # with pixel coords in rows 0-2 x cols 6-8 -> grid (0,3),(0,4),(1,3),(1,4)
    assert len(nodes) == 25 - 4
    assert edges.shape == (21, 8)
    assert (edges < 21).all()
    # interior surviving node away from the hole has all 8 neighbors
    # (grid (3,1) -> pixel (6,2) -> position (0.2, 0.6))
    mid = np.nonzero((np.abs(nodes[:, 0] - 0.2) < 1e-6)
                     & (np.abs(nodes[:, 1] - 0.6) < 1e-6))[0][0]
    assert (edges[mid] >= 0).sum() == 8
    # pixel on a valid interior node gets weight 1 on that node
    a, wgt = anchors[4, 4], weights[4, 4]
    assert wgt.sum() == 1.0 and (a >= 0).all()
    nid = a[np.argmax(wgt)]
    assert np.allclose(nodes[nid], pimg[4, 4], atol=1e-6)
    # pixels inside the dead cell get no anchors
    assert (anchors[1, 7] == -1).all() and (weights[1, 7] == 0).all()
    # valid pixels have bilinear weights summing to 1
    ok = (anchors >= 0).all(-1)
    assert ok.any()
    assert np.allclose(weights[ok].sum(-1), 1.0, atol=1e-5)
