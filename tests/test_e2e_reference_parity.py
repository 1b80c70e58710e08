"""End-to-end registration parity: reference optimizer loop vs ours.

Runs the reference's actual ``optimize_deformation_pyramid`` (torch CPU,
with stub pytorch3d/open3d/skimage modules providing only what the loop
touches) and our compiled solver on the same pair/config, comparing final
EPE at the metric level (SURVEY.md §7: RNG streams differ, parity is
metric-level not bitwise).

Dev-time oracle; skips without the reference tree.
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")
torch = pytest.importorskip("torch")


def _install_stubs():
    """Minimal stand-ins for the reference's GPU/vis dependencies."""
    if "pytorch3d" in sys.modules:
        return

    class _KNN:
        def __init__(self, dists, idx):
            self.dists = dists
            self.idx = idx

    def knn_points(x, y, lengths1=None, lengths2=None, K=1):
        d = torch.cdist(x, y) ** 2                      # [B, N, M]
        dists, idx = torch.topk(d, K, dim=2, largest=False)
        return _KNN(dists, idx)

    def knn_gather(feats, idx, lengths=None):
        b, n, k = idx.shape
        out = feats[torch.arange(b)[:, None, None], idx]
        return out

    p3d = types.ModuleType("pytorch3d")
    ops = types.ModuleType("pytorch3d.ops")
    knn = types.ModuleType("pytorch3d.ops.knn")
    knn.knn_points = knn_points
    knn.knn_gather = knn_gather
    ops.knn = knn
    structures = types.ModuleType("pytorch3d.structures")
    pclouds = types.ModuleType("pytorch3d.structures.pointclouds")

    class Pointclouds:  # isinstance target only
        pass

    pclouds.Pointclouds = Pointclouds
    structures.pointclouds = pclouds
    p3d.ops = ops
    p3d.structures = structures
    sys.modules.update({
        "pytorch3d": p3d, "pytorch3d.ops": ops, "pytorch3d.ops.knn": knn,
        "pytorch3d.structures": structures,
        "pytorch3d.structures.pointclouds": pclouds,
    })

    for name in ("open3d", "mayavi", "mayavi.mlab"):
        sys.modules.setdefault(name, types.ModuleType(name))
    skimage = types.ModuleType("skimage")
    skimage.io = types.ModuleType("skimage.io")
    sys.modules.setdefault("skimage", skimage)
    sys.modules.setdefault("skimage.io", skimage.io)


class edict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    __setattr__ = dict.__setitem__


def test_e2e_registration_metric_parity():
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.registration import Registration

    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.models.pyramid import NDPConfig
    from deformationpyramid_tpu.solve.registration import SolverConfig, register_pair

    src, tgt, flow_gt = make_pair(n=400, seed=0, deform=0.12)

    common = dict(m=5, k0=-5, depth=2, width=48, iters=80, lr=0.01,
                  samples=300, max_break_count=15,
                  break_threshold_ratio=0.001)

    # ---- reference run (torch CPU) ----
    torch.manual_seed(0)
    cfg_ref = edict(dict(common, device=torch.device("cpu"),
                         deformation_model="NDP", w_reg=0.0,
                         rotation_format="axis_angle", motion_type="SE3"))
    reg = Registration(cfg_ref)
    reg.load_pcds(src.copy(), tgt.copy())
    warped_ref, _, _ = reg.register(timer=None)
    epe_ref = np.linalg.norm(
        (warped_ref.detach().numpy() - src) - flow_gt, axis=1).mean()

    # ---- our run ----
    scfg = SolverConfig(
        pyramid=NDPConfig(m=common["m"], k0=common["k0"], depth=common["depth"],
                          width=common["width"]),
        iters=common["iters"], lr=common["lr"],
        max_break_count=common["max_break_count"],
        break_threshold_ratio=common["break_threshold_ratio"],
        samples=common["samples"], use_pallas=False)
    warped_ours, stats = jax.jit(
        lambda k, s, t: register_pair(k, s, t, scfg))(
        jax.random.key(0), jnp.array(src), jnp.array(tgt))
    epe_ours = np.linalg.norm(
        (np.asarray(warped_ours) - src) - flow_gt, axis=1).mean()

    epe_before = np.linalg.norm(flow_gt, axis=1).mean()
    # both solvers must converge substantially, and agree at the metric level
    assert epe_ref < 0.5 * epe_before, (epe_before, epe_ref)
    assert epe_ours < 0.5 * epe_before, (epe_before, epe_ours)
    rel_gap = abs(epe_ours - epe_ref) / max(epe_ref, 1e-6)
    # different RNG streams: allow a modest relative band
    assert rel_gap < 0.5, (epe_ref, epe_ours, rel_gap)
