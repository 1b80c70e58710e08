"""Headless visualization helpers: correspondence lines, deformation
graph, mesh (reference ``utils/vis.py`` capabilities re-done as PNG+PLY)."""
import numpy as np

from deformationpyramid_tpu.utils.vis import (
    export_correspondences_ply,
    export_graph_ply,
    export_mesh_ply,
    visualize_correspondences,
    visualize_graph,
    visualize_mesh,
)


def _ply_header(path):
    lines = open(path).read().splitlines()
    return lines[: lines.index("end_header") + 1]


def test_correspondence_render(tmp_path):
    rng = np.random.default_rng(0)
    s = rng.normal(size=(40, 3)).astype(np.float32)
    t = s + 0.1
    conf = rng.uniform(size=40)
    png = visualize_correspondences(
        s, t, confidence=conf, src_pcd=s, tgt_pcd=t,
        save_path=str(tmp_path / "corr.png"))
    assert (tmp_path / "corr.png").stat().st_size > 1000

    ply = tmp_path / "corr.ply"
    export_correspondences_ply(str(ply), s, t, inlier=conf > 0.5)
    hdr = _ply_header(ply)
    assert "element vertex 80" in hdr
    assert "element edge 40" in hdr
    body = open(ply).read().splitlines()[len(hdr):]
    assert len(body) == 80 + 40
    # edge rows reference valid vertex ids and carry RGB
    v1, v2, r, g, b = body[-1].split()
    assert 0 <= int(v1) < 80 and 0 <= int(v2) < 80
    assert 0 <= int(r) <= 255

    # subsampling path: more lines than max_lines
    visualize_correspondences(
        np.tile(s, (100, 1)), np.tile(t, (100, 1)),
        save_path=str(tmp_path / "corr_big.png"), max_lines=50)


def test_graph_render(tmp_path):
    rng = np.random.default_rng(1)
    nodes = rng.normal(size=(12, 3)).astype(np.float32)
    edges = np.argsort(
        ((nodes[:, None] - nodes[None]) ** 2).sum(-1), axis=1)[:, :4]
    valid = np.ones_like(edges, bool)
    valid[:, 3] = False
    png = visualize_graph(nodes, edges, edges_valid=valid, pcd=nodes,
                          save_path=str(tmp_path / "g.png"))
    assert (tmp_path / "g.png").stat().st_size > 1000

    ply = tmp_path / "g.ply"
    export_graph_ply(str(ply), nodes, edges, edges_valid=valid)
    hdr = _ply_header(ply)
    assert "element vertex 12" in hdr
    # self edge (column 0 of argsort) dropped; 2 valid non-self per node
    assert "element edge 24" in hdr


def test_mesh_render(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    tris = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    png = visualize_mesh(verts, tris, save_path=str(tmp_path / "m.png"))
    assert (tmp_path / "m.png").stat().st_size > 1000
    ply = tmp_path / "m.ply"
    export_mesh_ply(str(ply), verts, tris)
    hdr = _ply_header(ply)
    assert "element vertex 4" in hdr and "element face 4" in hdr
    assert open(ply).read().splitlines()[-1] == "3 1 2 3"
