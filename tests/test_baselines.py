"""End-to-end tests for the baseline solvers (NSFP, Nerfies, Sinkhorn, ED)."""
import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.data.synthetic import make_pair
from deformationpyramid_tpu.models.baselines import (
    NSFPConfig, NerfiesConfig, init_nerfies_params, nerfies_jacobian,
    nerfies_posenc, nerfies_warp,
)
from deformationpyramid_tpu.solve.baselines import (
    EDSolverConfig, NSFPSolverConfig, NerfiesSolverConfig, SinkhornSolverConfig,
    register_ed, register_nerfies, register_nsfp, register_sinkhorn,
)
from deformationpyramid_tpu.losses import nerfies_regularization


def _epe(warped, src, flow_gt):
    return np.linalg.norm((np.asarray(warped) - src) - flow_gt, axis=-1).mean()


def test_nsfp_converges():
    src, tgt, flow_gt = make_pair(n=256, seed=0, deform=0.12)
    cfg = NSFPSolverConfig(net=NSFPConfig(width=32, n_layers=5),
                           iters=150, samples=256, use_pallas=False)
    warped, stats = jax.jit(lambda k, s, t: register_nsfp(k, s, t, cfg))(
        jax.random.key(0), jnp.array(src), jnp.array(tgt))
    before = np.linalg.norm(flow_gt, axis=-1).mean()
    assert _epe(warped, src, flow_gt) < 0.5 * before
    assert int(stats["iters"]) >= 1


def test_nerfies_posenc_window_schedule():
    cfg = NerfiesConfig(m_bands=6, k0=-3, max_iter=100)
    x = jnp.array([[0.3, -0.2, 0.1]])
    pe0 = np.asarray(nerfies_posenc(x, 0, cfg))
    pe_end = np.asarray(nerfies_posenc(x, 100, cfg))
    assert pe0.shape == (1, 3 + 36)
    # at iter 0 the window zeroes all bands except leading-edge partial
    assert np.abs(pe0[0, 3:]).max() == 0.0
    # at the end all bands are open
    assert np.abs(pe_end[0, 3:]).max() > 0.0
    # first 3 dims are raw position passthrough
    assert np.allclose(pe0[0, :3], [0.3, -0.2, 0.1], atol=1e-7)


def test_nerfies_jacobian_matches_finite_difference():
    cfg = NerfiesConfig(depth=3, width=16, max_iter=100)
    params = init_nerfies_params(jax.random.key(0), cfg)
    x = jnp.array(np.random.default_rng(0).normal(size=(4, 3)) * 0.3, jnp.float32)
    J = np.asarray(nerfies_jacobian(params, x, 50, cfg))
    eps = 1e-3
    for j in range(3):
        xp = x.at[:, j].add(eps)
        xm = x.at[:, j].add(-eps)
        fd = (np.asarray(nerfies_warp(params, xp, 50, cfg))
              - np.asarray(nerfies_warp(params, xm, 50, cfg))) / (2 * eps)
        assert np.allclose(J[:, :, j], fd, atol=2e-2), j


def test_nerfies_regularization_identity_jacobian_is_zero():
    J = jnp.broadcast_to(jnp.eye(3), (10, 3, 3))
    assert abs(float(nerfies_regularization(J))) < 1e-10
    # scaling by e gives log(e)^2 = 1
    Je = jnp.eye(3)[None] * np.e
    assert abs(float(nerfies_regularization(Je)) - 1.0) < 1e-4


def test_nerfies_converges():
    src, tgt, flow_gt = make_pair(n=200, seed=1, deform=0.1)
    cfg = NerfiesSolverConfig(net=NerfiesConfig(depth=3, width=32),
                              iters=120, samples=200, use_pallas=False)
    warped, stats = jax.jit(lambda k, s, t: register_nerfies(k, s, t, cfg))(
        jax.random.key(1), jnp.array(src), jnp.array(tgt))
    before = np.linalg.norm(flow_gt, axis=-1).mean()
    assert _epe(warped, src, flow_gt) < 0.75 * before


def test_sinkhorn_moves_points_toward_target():
    src, tgt, _ = make_pair(n=128, seed=2, deform=0.15)
    cfg = SinkhornSolverConfig(samples=128, n_steps=8, ot_iters=12)
    moved, valid, s_idx, stats = jax.jit(
        lambda k, s, t: register_sinkhorn(k, s, t, cfg))(
        jax.random.key(2), jnp.array(src), jnp.array(tgt))
    moved = np.asarray(moved)
    # chamfer to target decreased
    def cham(a, b):
        d = ((a[:, None] - b[None]) ** 2).sum(-1)
        return np.sqrt(d.min(1)).mean() + np.sqrt(d.min(0)).mean()
    assert cham(moved, tgt) < 0.5 * cham(src, tgt)
    assert np.isfinite(moved).all()


def _toy_graph(src, n_nodes=16, k_edges=4, k_anchor=4, coverage=0.5):
    """Tiny numpy deformation graph: FPS-ish nodes + kNN edges/anchors."""
    rng = np.random.default_rng(0)
    nodes = src[rng.permutation(len(src))[:n_nodes]]
    d_nn = ((nodes[:, None] - nodes[None]) ** 2).sum(-1)
    np.fill_diagonal(d_nn, np.inf)
    edges = np.argsort(d_nn, axis=1)[:, :k_edges].astype(np.int32)
    ew = np.ones((n_nodes, k_edges), np.float32) / k_edges
    d_pa = ((src[:, None] - nodes[None]) ** 2).sum(-1)
    anchors = np.argsort(d_pa, axis=1)[:, :k_anchor].astype(np.int32)
    ad = np.take_along_axis(d_pa, anchors, axis=1)
    aw = np.exp(-ad / (2 * coverage ** 2))
    aw = (aw / aw.sum(1, keepdims=True)).astype(np.float32)
    return nodes, edges, ew, anchors, aw


def test_ed_converges_on_rigid_pair():
    src, tgt, flow_gt = make_pair(n=200, seed=3, deform=0.1, rigid=True)
    nodes, edges, ew, anchors, aw = _toy_graph(src)
    cfg = EDSolverConfig(iters=150, samples=200, use_pallas=False)
    warped, stats = jax.jit(
        lambda k, s, t: register_ed(
            k, s, t, jnp.array(nodes), jnp.array(edges), jnp.array(ew),
            jnp.array(anchors), jnp.array(aw), cfg))(
        jax.random.key(3), jnp.array(src), jnp.array(tgt))
    before = np.linalg.norm(flow_gt, axis=-1).mean()
    after = _epe(warped, src, flow_gt)
    assert after < 0.5 * before, (before, after)
