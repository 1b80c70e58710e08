"""Deformable KPConv parity vs the reference torch module.

Oracle test in the style of test_matcher_parity: instantiate the reference
``KPConv`` (``correspondence/lepard/blocks.py:135-374``) with
``deformable=True``, port its weights into our param tree, feed both the
same cloud/neighbor table, and compare outputs plus the deformable
internals (``min_d2``, ``deformed_KP``). The reference never enables this
branch in a shipped config (``configs/lepard.yaml:21`` deformable: False)
but ``block_decider`` dispatches it for ``*_deformable*`` block names.

Dev-time oracle: skips without /root/reference or torch.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")
torch = pytest.importorskip("torch")

CORR = os.path.join(REF, "correspondence")
if CORR not in sys.path:
    sys.path.insert(0, CORR)

from deformationpyramid_tpu.match.kpconv import (  # noqa: E402
    KPConvConfig, apply_kpconv, init_kpconv,
)

K_NEIGHB = 12
N_PTS = 64
KP_EXTENT = 0.12
RADIUS = 0.15


def _make_cloud(seed: int):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, (N_PTS, 3)).astype(np.float32)
    d2 = np.sum((pts[:, None] - pts[None]) ** 2, axis=-1)
    order = np.argsort(d2, axis=1)[:, :K_NEIGHB].astype(np.int64)
    # shadow out the far half of some rows so the shadow path is exercised
    neighb = order.copy()
    neighb[::3, K_NEIGHB // 2:] = N_PTS
    feats = rng.normal(size=(N_PTS, 8)).astype(np.float32)
    return pts, neighb, feats


def _ref_conv(modulated: bool, seed: int, tmp_path):
    from lepard.blocks import KPConv

    cwd = os.getcwd()
    os.chdir(tmp_path)  # load_kernels caches dispositions under cwd/kernels
    try:
        torch.manual_seed(seed)
        conv = KPConv(15, 3, 8, 16, KP_EXTENT, RADIUS,
                      deformable=True, modulated=modulated)
    finally:
        os.chdir(cwd)
    # non-trivial offsets: the zero-init offset_bias would otherwise leave
    # offsets driven purely by the (already random) offset_conv weights
    with torch.no_grad():
        conv.offset_bias.uniform_(-0.3, 0.3)
    return conv


def _port(conv, modulated: bool) -> tuple[dict, KPConvConfig]:
    cfg = KPConvConfig(num_kernel_points=15, KP_extent=KP_EXTENT,
                       modulated=modulated)
    p = init_kpconv(jax.random.PRNGKey(0), 8, 16, RADIUS, cfg,
                    deformable=True)
    p["weights"] = jnp.asarray(conv.weights.detach().numpy())
    p["kernel_points"] = jnp.asarray(conv.kernel_points.detach().numpy())
    p["offset_conv"]["weights"] = jnp.asarray(
        conv.offset_conv.weights.detach().numpy())
    p["offset_conv"]["kernel_points"] = jnp.asarray(
        conv.offset_conv.kernel_points.detach().numpy())
    p["offset_bias"] = jnp.asarray(conv.offset_bias.detach().numpy())
    return p, cfg


@pytest.mark.parametrize("modulated", [False, True])
def test_deformable_kpconv_forward_parity(modulated, tmp_path):
    conv = _ref_conv(modulated, seed=3, tmp_path=tmp_path)
    pts, neighb, feats = _make_cloud(seed=7)

    with torch.no_grad():
        ref = conv(torch.from_numpy(pts), torch.from_numpy(pts),
                   torch.from_numpy(neighb), torch.from_numpy(feats)).numpy()
    ref_min_d2 = conv.min_d2.numpy()
    ref_dkp = conv.deformed_KP.detach().numpy()

    p, cfg = _port(conv, modulated)
    out, aux = apply_kpconv(p, jnp.asarray(pts), jnp.asarray(pts),
                            jnp.asarray(neighb), jnp.asarray(feats),
                            KP_EXTENT, cfg, deformable=True, with_aux=True)

    np.testing.assert_allclose(np.asarray(aux["deformed_kp"]), ref_dkp,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux["min_d2"]), ref_min_d2,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_in_range_pruning_engages(tmp_path):
    """The parity above is only meaningful if the reference actually pruned
    neighbors (new_max_neighb < K); pin that with the same geometry."""
    from lepard.blocks import KPConv  # noqa: F401  (import check)

    conv = _ref_conv(False, seed=3, tmp_path=tmp_path)
    pts, neighb, feats = _make_cloud(seed=7)
    with torch.no_grad():
        conv(torch.from_numpy(pts), torch.from_numpy(pts),
             torch.from_numpy(neighb), torch.from_numpy(feats))
    # sq_distances kept per row after pruning == columns of min_d2's source;
    # recompute in_range from the saved deformed kernel points
    s_pad = np.concatenate([pts, np.full((1, 3), 1e6, np.float32)], axis=0)
    nb = s_pad[neighb] - pts[:, None]
    diff = nb[:, :, None, :] - conv.deformed_KP.detach().numpy()[:, None]
    sq = np.sum(diff ** 2, axis=-1)
    in_range = np.any(sq < KP_EXTENT ** 2, axis=2)
    kept = in_range.sum(axis=1)
    assert kept.max() < K_NEIGHB, "pruning never engaged; weaken KP_EXTENT"
    assert kept.min() >= 1, "some row lost all neighbors; test degenerate"


def test_deformable_blocks_in_plan_and_init():
    """'*_deformable*' names flow through kpfcn_plan/init and produce
    offset params; the coarse forward still runs (shapes only)."""
    from deformationpyramid_tpu.match.backbone import init_kpfcn, kpfcn_plan

    arch = ("simple", "resnetb_deformable", "resnetb_deformable_strided",
            "resnetb", "nearest_upsample", "unary")
    cfg = KPConvConfig(first_subsampling_dl=0.05, first_feats_dim=16,
                       coarse_feature_dim=24, fine_feature_dim=12,
                       coarse_level=-1)
    plan = kpfcn_plan(cfg, arch)
    assert [bp.deform for bp in plan.encoder] == [False, True, True, False]
    params = init_kpfcn(jax.random.PRNGKey(0), cfg, arch)
    assert "offset_conv" not in params["encoder"][0]["kpconv"]
    for i in (1, 2):
        kp = params["encoder"][i]["kpconv"]
        assert "offset_conv" in kp and "offset_bias" in kp
        assert kp["offset_bias"].shape == (3 * 15,)
