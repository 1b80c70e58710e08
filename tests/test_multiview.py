"""Tests for the multiview GAT stack, NonLocalNet, and datasets."""
import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.match.multiview import (
    GATConfig, MultiviewNeCoConfig, NonLocalNetConfig,
    apply_gat_layer, apply_multiview_neco, apply_nonlocalnet,
    build_correspondence_graph, init_gat_layer, init_multiview_neco,
    init_nonlocalnet,
)
from deformationpyramid_tpu.match.outlier_rejection import NeCoConfig


def test_gat_layer_aggregates_neighbors():
    cfg = GATConfig(feature_dim=16, n_head=4)
    p = init_gat_layer(jax.random.key(0), cfg)
    feat = jnp.array(np.random.default_rng(0).normal(size=(6, 16)), jnp.float32)
    # star graph: nodes 1..5 -> node 0
    es = jnp.array([1, 2, 3, 4, 5])
    et = jnp.array([0, 0, 0, 0, 0])
    ev = jnp.ones((5,), bool)
    out = apply_gat_layer(p, feat, es, et, ev, cfg)
    assert out.shape == (6, 16)
    assert np.isfinite(np.asarray(out)).all()
    # node with no in-edges gets only the bias
    assert np.allclose(np.asarray(out[1]), np.asarray(p["bias"]), atol=1e-6)
    # masked edges change nothing for untouched targets
    out2 = apply_gat_layer(p, feat, es, et, jnp.zeros((5,), bool), cfg)
    assert np.allclose(np.asarray(out2[0]), np.asarray(p["bias"]), atol=1e-6)


def test_build_correspondence_graph():
    # 2 pairs sharing cloud 0; matches at identical positions connect
    vec6d = np.zeros((2, 3, 6), np.float32)
    vec6d[0, 0, :3] = [0, 0, 0]
    vec6d[1, 0, :3] = [0, 0, 0]     # same head position in cloud 0
    vec6d[0, 1, :3] = [5, 5, 5]
    mask = np.ones((2, 3), bool)
    pairs = np.array([[0, 1], [0, 2]])
    es, et, ev = build_correspondence_graph(vec6d, mask, pairs,
                                            edge_radius=0.1, max_edges=64)
    # match (0,0) and (1,0) both touch cloud 0 at the origin -> edges both ways
    connected = {(int(a), int(b)) for a, b, v in zip(es, et, ev) if v}
    assert (0, 3) in connected and (3, 0) in connected


def test_multiview_neco_forward():
    cfg = MultiviewNeCoConfig(
        neco=NeCoConfig(feature_dim=48, n_head=4, num_layers=2))
    params = init_multiview_neco(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    vec6d = jnp.array(rng.normal(size=(2, 8, 6)) * 0.1, jnp.float32)
    mask = jnp.ones((2, 8), bool)
    es = jnp.arange(16) % 16
    et = (jnp.arange(16) + 1) % 16
    ev = jnp.ones((16,), bool)
    conf = apply_multiview_neco(params, vec6d, mask, es, et, ev, cfg)
    c = np.asarray(conf)
    assert c.shape == (2, 8)
    assert ((c >= 0) & (c <= 1)).all() and np.isfinite(c).all()


def test_nonlocalnet_forward():
    cfg = NonLocalNetConfig(num_layers=2, num_channels=32)
    params = init_nonlocalnet(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    vec6d = jnp.array(rng.normal(size=(20, 6)) * 0.1, jnp.float32)
    mask = jnp.array(np.arange(20) < 16)
    conf = apply_nonlocalnet(params, vec6d, mask, cfg)
    c = np.asarray(conf)
    assert c.shape == (20,)
    assert ((c >= 0) & (c <= 1)).all()
    assert (c[16:] == 0).all()


def test_multiview_dataset_reader(tmp_path):
    from deformationpyramid_tpu.data.fourdmatch_multiview import FourDMatchMultiview

    v, n, p = 3, 50, 3
    rng = np.random.default_rng(3)
    np.savez(tmp_path / "seq0.npz",
             pcds=rng.normal(size=(v, n, 3)).astype(np.float32),
             pcd_pairs=np.array([[0, 1], [0, 2], [1, 2]]),
             pairwise_flows=rng.normal(size=(p, n, 3)).astype(np.float32),
             pairwise_overlap=np.array([[0.9, 0.8], [0.2, 0.9], [0.7, 0.6]]),
             _2axis_flow=np.zeros((v, n, 3), np.float32),
             axis_node=np.zeros((3,), np.int64),
             poses=np.tile(np.eye(4, dtype=np.float32), (v, 1, 1)))
    ds = FourDMatchMultiview(str(tmp_path), ".", overlap_threshold=0.4)
    assert len(ds) == 1
    s = ds[0]
    # pair (0,2) filtered by overlap 0.2
    assert len(s.pcd_pairs) == 2
    assert s.pcds.shape == (v, n, 3)


def test_threedmatch_dataset_reader(tmp_path):
    from deformationpyramid_tpu.data.threedmatch import ThreeDMatchDataset

    rng = np.random.default_rng(4)
    src = rng.normal(size=(100, 3)).astype(np.float32)
    ang = 0.2
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    trans = np.array([[0.1], [0.0], [0.05]], np.float32)
    tgt = (rot @ src.T + trans).T
    np.save(tmp_path / "src.npy", src)
    np.save(tmp_path / "tgt.npy", tgt)
    np.savez(tmp_path / "info.npz", rot=rot[None], trans=trans[None],
             src=np.array(["src.npy"]), tgt=np.array(["tgt.npy"]))
    ds = ThreeDMatchDataset(str(tmp_path / "info.npz"), str(tmp_path))
    assert len(ds) == 1
    pair = ds[0]
    # rigid: flow_gt equals the rigid displacement, full overlap
    assert np.allclose(pair.flow_gt, tgt - src, atol=1e-5)
    assert pair.overlap.all()


def test_train_multiview_cli_end_to_end(tmp_path):
    """The multiview driver trains the GAT confidence model end-to-end on a
    fabricated suite: loss drops and post-filter IR beats the planted
    inlier rate (the reference's multiview path is dead code with no entry
    point; this is its drivable equivalent)."""
    import json
    import os
    import subprocess
    import sys

    from deformationpyramid_tpu.data.synthetic import write_multiview_suite

    root = str(tmp_path / "mv")
    write_multiview_suite(root, "multiview-train", n_seqs=2, n_views=3,
                          n_pts=120, seed=1)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['x','--data-root', %r, '--epochs','6',"
        "'--k','24','--max-pairs','6','--max-edges','2048',"
        "'--feature-dim','48','--num-layers','2',"
        "'--snapshot-dir', %r];"
        "from deformationpyramid_tpu.cli.train_multiview import main; main()"
        % (root, str(tmp_path / "snap"))
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=str(tmp_path), timeout=900, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in
            (tmp_path / "snap" / "history.jsonl").read_text().splitlines()]
    assert rows[-1]["loss"] < rows[0]["loss"], rows
    assert rows[-1]["IR_after"] > rows[-1]["IR_before"], rows[-1]
    assert (tmp_path / "snap" / "model_best_loss.npz").exists()
