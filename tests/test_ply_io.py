"""PLY I/O: ascii + binary readers, writer roundtrip, surface sampling."""
import struct

import numpy as np

from deformationpyramid_tpu.data.ply import PlyMesh, load_ply, sample_points_uniformly, save_ply


def test_ascii_roundtrip(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    p = str(tmp_path / "m.ply")
    save_ply(p, v, f)
    mesh = load_ply(p)
    assert np.allclose(mesh.vertices, v, atol=1e-5)
    assert (mesh.faces == f).all()


def test_binary_little_endian_reader(tmp_path):
    v = np.array([[0.5, 1.5, -2.0], [3.0, 0.0, 1.0]], np.float32)
    faces = [[0, 1, 0]]
    p = tmp_path / "b.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "element face 1\n"
        "property list uchar uint vertex_indices\n"
        "end_header\n")
    with open(p, "wb") as fh:
        fh.write(header.encode())
        normals = np.array([[0, 0, 1], [0, 1, 0]], np.float32)
        for i in range(2):
            fh.write(struct.pack("<6f", *v[i], *normals[i]))
        fh.write(struct.pack("<B3I", 3, *faces[0]))
    mesh = load_ply(str(p))
    assert np.allclose(mesh.vertices, v, atol=1e-6)
    assert np.allclose(mesh.normals, normals, atol=1e-6)
    assert (mesh.faces == np.array(faces)).all()


def test_surface_sampling_area_weighted():
    # two triangles, one 100x larger: samples should concentrate there
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                  [10, 0, 0], [20, 0, 0], [10, 10, 0]], np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    pts = sample_points_uniformly(PlyMesh(v, f), 2000, seed=0)
    frac_big = (pts[:, 0] >= 9.99).mean()
    assert frac_big > 0.95
    # all samples inside the union bounding box
    assert pts[:, 2].max() == 0.0


def test_threedmatch_pth_cloud(tmp_path):
    import torch

    from deformationpyramid_tpu.data.threedmatch import _load_cloud

    arr = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    p = str(tmp_path / "c.pth")
    torch.save(torch.from_numpy(arr), p)
    got = _load_cloud(p)
    assert np.allclose(got, arr, atol=1e-6)
