"""Deformation-graph construction from depth maps (ED/N-ICP baseline).

Re-design of the reference MVRegC C++ module
(``/root/reference/cxx/cpu/image_proc.cpp:56-198``, ``graph_proc.cpp``):
depth -> triangle mesh -> erosion -> node sampling -> geodesic edges ->
per-point anchors+skinning weights. This numpy/scipy implementation is the
semantic reference; ``cxx/`` holds the C++ accelerated version with the same
API (used when built).

All functions operate on host (irregular, data-dependent shapes); the
resulting fixed-K arrays feed the jitted ED solver
(``solve/baselines.register_ed``).
"""
from __future__ import annotations

import dataclasses

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import connected_components, dijkstra

from ..geometry.camera import depth_to_pointcloud


@dataclasses.dataclass
class DeformationGraph:
    nodes: np.ndarray           # [M, 3]
    node_indices: np.ndarray    # [M] vertex index of each node
    edges: np.ndarray           # [M, E] neighbor node ids (-pad with self)
    edge_weights: np.ndarray    # [M, E]
    edges_valid: np.ndarray     # [M, E] bool
    point_anchors: np.ndarray   # [N, K] node ids per mesh vertex
    anchor_weights: np.ndarray  # [N, K] normalized skinning weights
    vertices: np.ndarray        # [N, 3] (eroded mesh vertices)
    vertex_pixels: np.ndarray   # [N, 2] (u, v) per vertex


def depth_to_mesh(depth: np.ndarray, intrinsics: np.ndarray,
                  max_triangle_distance: float = 0.06,
                  depth_scale: float = 1.0):
    """Triangulate adjacent valid depth pixels (2 triangles per quad) with a
    max-edge-length filter (``image_proc.cpp:56-198``).

    Returns (vertices [N,3], faces [F,3], vertex_pixels [N,2]).
    """
    d = depth.astype(np.float64) / depth_scale
    h, w = d.shape
    valid = d > 0
    pc = depth_to_pointcloud(d, intrinsics)            # [3, H, W]
    vid = np.full((h, w), -1, np.int64)
    vid[valid] = np.arange(valid.sum())
    vv, uu = np.nonzero(valid)
    vertices = pc[:, vv, uu].T.astype(np.float32)
    vertex_pixels = np.stack([uu, vv], 1).astype(np.int64)

    # quad corners: (y,x) (y,x+1) (y+1,x) (y+1,x+1)
    a = vid[:-1, :-1]
    b = vid[:-1, 1:]
    c = vid[1:, :-1]
    e = vid[1:, 1:]
    P = np.transpose(pc, (1, 2, 0))

    def edge_ok(p, q):
        return np.linalg.norm(p - q, axis=-1) <= max_triangle_distance

    pa, pb, pc_, pe = P[:-1, :-1], P[:-1, 1:], P[1:, :-1], P[1:, 1:]
    # triangle 1: (a, b, c); triangle 2: (b, e, c) — standard quad split
    t1_ok = (a >= 0) & (b >= 0) & (c >= 0) & \
        edge_ok(pa, pb) & edge_ok(pa, pc_) & edge_ok(pb, pc_)
    t2_ok = (b >= 0) & (e >= 0) & (c >= 0) & \
        edge_ok(pb, pe) & edge_ok(pb, pc_) & edge_ok(pe, pc_)
    f1 = np.stack([a[t1_ok], b[t1_ok], c[t1_ok]], 1)
    f2 = np.stack([b[t2_ok], e[t2_ok], c[t2_ok]], 1)
    faces = np.concatenate([f1, f2]).astype(np.int64)
    return vertices, faces, vertex_pixels


def _vertex_adjacency(n_vertices: int, faces: np.ndarray) -> csr_matrix:
    i = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2],
                        faces[:, 1], faces[:, 2], faces[:, 0]])
    j = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0],
                        faces[:, 0], faces[:, 1], faces[:, 2]])
    w = np.ones(len(i))
    adj = csr_matrix((w, (i, j)), shape=(n_vertices, n_vertices))
    adj.sum_duplicates()
    adj.data[:] = 1.0
    return adj


def erode_mesh(vertices: np.ndarray, faces: np.ndarray,
               n_iterations: int = 4, min_neighbors: int = 4) -> np.ndarray:
    """Iteratively mark boundary-ish vertices invalid
    (``graph_proc.cpp:16-79``). Returns a bool keep-mask over vertices."""
    n = len(vertices)
    adj = _vertex_adjacency(n, faces)
    keep = np.ones(n, bool)
    for _ in range(n_iterations):
        counts = adj.dot(keep.astype(np.float64))
        new_keep = keep & (counts >= min_neighbors)
        if (new_keep == keep).all():
            break
        keep = new_keep
    return keep


def sample_nodes(vertices: np.ndarray, valid: np.ndarray,
                 node_coverage: float = 0.05,
                 random_shuffle: bool = False, seed: int = 0) -> np.ndarray:
    """Coverage sampling: greedily take vertices farther than
    ``node_coverage`` from every chosen node (``graph_proc.cpp:81-143``).
    Returns vertex indices of the nodes."""
    order = np.nonzero(valid)[0]
    if random_shuffle:
        order = np.random.default_rng(seed).permutation(order)
    nodes: list[int] = []
    node_pos = np.zeros((0, 3), np.float32)
    cov2 = node_coverage ** 2
    for vi in order:
        p = vertices[vi]
        if len(nodes) == 0 or np.min(
                np.sum((node_pos - p) ** 2, axis=1)) > cov2:
            nodes.append(int(vi))
            node_pos = np.vstack([node_pos, p[None]])
    return np.array(nodes, np.int64)


def _mesh_edge_graph(vertices: np.ndarray, faces: np.ndarray) -> csr_matrix:
    i = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    j = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    d = np.linalg.norm(vertices[i] - vertices[j], axis=1)
    g = csr_matrix((np.concatenate([d, d]),
                    (np.concatenate([i, j]), np.concatenate([j, i]))),
                   shape=(len(vertices), len(vertices)))
    g.sum_duplicates()
    return g


def compute_edges_geodesic(vertices: np.ndarray, faces: np.ndarray,
                           node_indices: np.ndarray, n_max_neighbors: int = 8,
                           node_coverage: float = 0.05):
    """Geodesic kNN edges between nodes + node->vertex distances
    (``graph_proc.cpp:161-310``).

    Returns (edges [M,E], edge_weights [M,E], edges_valid [M,E],
    node_to_vertex_dist [M,N]).
    """
    g = _mesh_edge_graph(vertices, faces)
    dist = dijkstra(g, directed=False, indices=node_indices)  # [M, N]
    m = len(node_indices)
    node_dist = dist[:, node_indices]                        # [M, M]
    np.fill_diagonal(node_dist, np.inf)
    order = np.argsort(node_dist, axis=1)[:, :n_max_neighbors]
    nd = np.take_along_axis(node_dist, order, axis=1)
    valid = np.isfinite(nd)
    edges = np.where(valid, order, np.arange(m)[:, None])
    # skinning weight per edge: exp(-d^2 / (2 sigma^2)), sigma=node_coverage
    # (graph_proc.cpp compute_anchor_weight:153-158)
    w = np.where(valid, np.exp(-nd ** 2 / (2 * node_coverage ** 2)), 0.0)
    return edges.astype(np.int64), w.astype(np.float32), valid, dist


def compute_pixel_anchors_geodesic(node_to_vertex_dist: np.ndarray,
                                   n_anchors: int = 4,
                                   node_coverage: float = 0.05):
    """Per-vertex K nearest nodes by geodesic distance + normalized weights
    (``graph_proc.cpp:556-641``). Returns (anchors [N,K], weights [N,K]).
    Vertices unreachable from any node get anchor 0 / weight uniform."""
    d = node_to_vertex_dist.T                         # [N, M]
    order = np.argsort(d, axis=1)[:, :n_anchors]
    nd = np.take_along_axis(d, order, axis=1)
    valid = np.isfinite(nd)
    w = np.where(valid, np.exp(-nd ** 2 / (2 * node_coverage ** 2)), 0.0)
    wsum = w.sum(1, keepdims=True)
    uniform = np.full_like(w, 1.0 / n_anchors)
    w = np.where(wsum > 1e-12, w / np.maximum(wsum, 1e-12), uniform)
    anchors = np.where(valid, order, 0)
    return anchors.astype(np.int64), w.astype(np.float32)


def node_and_edge_clean_up(edges_valid: np.ndarray,
                           min_neighbors: int = 2) -> np.ndarray:
    """Keep-mask over nodes with >= min_neighbors valid edges
    (``graph_proc.cpp:409-459``)."""
    return edges_valid.sum(1) >= min_neighbors


def compute_clusters(edges: np.ndarray, edges_valid: np.ndarray) -> np.ndarray:
    """Connected components over the node graph (``graph_proc.cpp:461-554``)."""
    m = len(edges)
    i = np.repeat(np.arange(m), edges.shape[1])[edges_valid.reshape(-1)]
    j = edges.reshape(-1)[edges_valid.reshape(-1)]
    g = csr_matrix((np.ones(len(i)), (i, j)), shape=(m, m))
    _, labels = connected_components(g, directed=False)
    return labels


def build_deformation_graph_from_depth(depth: np.ndarray, intrinsics: np.ndarray,
                                       max_triangle_distance: float = 0.06,
                                       node_coverage: float = 0.05,
                                       n_max_neighbors: int = 8,
                                       n_anchors: int = 4,
                                       erosion_iters: int = 4,
                                       erosion_min_neighbors: int = 4,
                                       depth_scale: float = 1000.0) -> DeformationGraph:
    """Full driver (``model/geometry.py:155-387`` semantics)."""
    vertices, faces, vertex_pixels = depth_to_mesh(
        depth, intrinsics, max_triangle_distance, depth_scale)
    keep = erode_mesh(vertices, faces, erosion_iters, erosion_min_neighbors)
    node_indices = sample_nodes(vertices, keep, node_coverage)
    if len(node_indices) == 0:
        raise ValueError("empty node set — depth map too sparse")
    edges, ew, evalid, n2v = compute_edges_geodesic(
        vertices, faces, node_indices, n_max_neighbors, node_coverage)
    anchors, aw = compute_pixel_anchors_geodesic(n2v, n_anchors, node_coverage)
    return DeformationGraph(
        nodes=vertices[node_indices], node_indices=node_indices,
        edges=edges, edge_weights=ew, edges_valid=evalid,
        point_anchors=anchors, anchor_weights=aw,
        vertices=vertices, vertex_pixels=vertex_pixels)
