"""Full matcher forward parity: reference torch Pipeline vs our matcher.

The strongest LNDP oracle: instantiate the reference Pipeline (random
weights, fixed seed), port its state_dict into our param tree with
``port_torch``, pin our kernel dispositions to the reference's, feed both
models the SAME collate pyramid, and compare the confidence matrix and
rigid fit. Passing means the reference's *pretrained* checkpoints will
reproduce its results in this framework.

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


class edict(dict):
    """Minimal EasyDict stand-in (easydict not installed)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    __setattr__ = dict.__setitem__


def wrap(d):
    if isinstance(d, dict):
        return edict({k: wrap(v) for k, v in d.items()})
    return d


@pytest.fixture(scope="module")
def ref_pipeline(tmp_path_factory):
    import yaml

    # load_kernels caches dispositions under cwd/kernels/ — keep it out of
    # the repo tree
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("kp_cache"))
    try:
        with open(os.path.join(CORR, "configs/lepard.yaml")) as f:
            mc = wrap(yaml.safe_load(f))
        torch.manual_seed(0)
        from lepard.pipeline import Pipeline

        pipe = Pipeline(mc).eval()
    finally:
        os.chdir(cwd)
    return pipe, mc


def test_matcher_forward_parity(ref_pipeline):
    pipe, mc = ref_pipeline

    from deformationpyramid_tpu.data.collate import (
        build_pair_pyramid, calibrate_neighborhood_limits,
    )
    from deformationpyramid_tpu.data.synthetic import make_pair
    
    from deformationpyramid_tpu.match.backbone import KPFCN_ARCHITECTURE
    from deformationpyramid_tpu.match.config_loader import matcher_config_from_yaml
    from deformationpyramid_tpu.match.pipeline import apply_matcher, init_matcher
    from deformationpyramid_tpu.match.port_torch import port_matcher

    cfg = matcher_config_from_yaml(mc)

    # ---- shared input pyramid (unpadded) ----
    src, tgt, _ = make_pair(n=300, seed=0, deform=0.05)
    src = src * 0.2  # shrink to metric scale ~ the voxel sizes expect
    tgt = tgt * 0.2
    limits = calibrate_neighborhood_limits([(src, tgt)], cfg.kpfcn,
                                           KPFCN_ARCHITECTURE)
    pyr = build_pair_pyramid(src, tgt, cfg.kpfcn, KPFCN_ARCHITECTURE, limits)
    s_len, t_len = pyr.src_lengths[2], pyr.tgt_lengths[2]

    # ---- reference forward ----
    data = {
        "points": [torch.from_numpy(p) for p in pyr.points],
        # collate ships int32 index tables (transfer-size optimization);
        # torch indexing wants int64
        "neighbors": [torch.from_numpy(n).long() for n in pyr.neighbors],
        "pools": [torch.from_numpy(p).long() for p in pyr.pools] + [torch.zeros(0, 1).long()],
        "upsamples": [torch.from_numpy(u).long() for u in pyr.upsamples] + [torch.zeros(0, 1).long()],
        "features": torch.from_numpy(pyr.features),
        "stack_lengths": [torch.tensor([pyr.src_lengths[l], pyr.tgt_lengths[l]])
                          for l in range(len(pyr.points))],
        "src_mask": torch.ones(1, s_len, dtype=torch.bool),
        "tgt_mask": torch.ones(1, t_len, dtype=torch.bool),
        "src_ind_coarse_split": torch.arange(s_len),
        "tgt_ind_coarse_split": torch.arange(t_len),
        "src_ind_coarse": torch.arange(s_len),
        "tgt_ind_coarse": s_len + torch.arange(t_len),
    }
    with torch.no_grad():
        out = pipe(data)
    conf_ref = out["conf_matrix_pred"][0].numpy()
    R_ref = out["R_s2t_pred"][0].numpy()
    t_ref = out["t_s2t_pred"][0].numpy()

    # ---- port weights + kernel dispositions into our model ----
    params = init_matcher(jax.random.key(0), cfg)
    sd = {k: v.detach().numpy() for k, v in pipe.state_dict().items()}
    params, report = port_matcher(sd, params, cfg.transformer.layer_types)
    assert report["missing"] == [], report["missing"]

    # kernel dispositions port as per-module buffers (state_dict carries
    # kernel_points); nothing to patch
    pyrd = {"points": [jnp.array(p) for p in pyr.points],
            "valids": [jnp.array(v) for v in pyr.valids],
            "neighbors": [jnp.array(x) for x in pyr.neighbors],
            "pools": [jnp.array(x) for x in pyr.pools],
            "upsamples": [jnp.array(x) for x in pyr.upsamples],
            "features": jnp.array(pyr.features)}
    ours = apply_matcher(params, pyrd, jnp.int32(s_len), jnp.int32(t_len),
                         cfg, s_cap=s_len, t_cap=t_len)

    conf_got = np.asarray(ours["conf_matrix_pred"])
    # confidence matrices agree (f32 through an 11-block network: compare
    # with a correlation + max-abs criterion)
    denom = np.linalg.norm(conf_ref) * np.linalg.norm(conf_got) + 1e-12
    corr = float((conf_ref * conf_got).sum() / denom)
    assert corr > 0.999, corr
    assert np.abs(conf_got - conf_ref).max() < 5e-3, \
        np.abs(conf_got - conf_ref).max()

    R_got = np.asarray(ours["R_s2t_pred"])
    t_got = np.asarray(ours["t_s2t_pred"])
    assert np.abs(R_got - R_ref).max() < 5e-3
    assert np.abs(t_got - t_ref).max() < 5e-3


def test_neco_forward_parity():
    """Reference Outlier_Rejection vs our NeCo with ported weights."""
    import yaml

    with open(os.path.join(CORR, "configs/outlier_rejection.yaml")) as f:
        oc = wrap(yaml.safe_load(f))
    torch.manual_seed(1)
    from outlier_rejection.pipeline import Outlier_Rejection

    ref = Outlier_Rejection(oc.model).eval()

    from deformationpyramid_tpu.match.config_loader import neco_config_from_yaml
    from deformationpyramid_tpu.match.outlier_rejection import apply_neco, init_neco
    from deformationpyramid_tpu.match.port_torch import port_neco

    ncfg = neco_config_from_yaml(oc)
    params = init_neco(jax.random.key(0), ncfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, report = port_neco(sd, params)
    assert report["missing"] == [], report["missing"]
    assert report["unused"] == [], report["unused"]

    # shared inputs: one pair, K matches
    rng = np.random.default_rng(0)
    k = 40
    s_pos = rng.normal(size=(k, 3)).astype(np.float32) * 0.3
    t_pos = (s_pos + rng.normal(size=(k, 3)).astype(np.float32) * 0.05)
    vec6d = np.concatenate([s_pos, t_pos], 1)

    # reference path: drive forward() via a data dict
    data = {
        "s_pcd": torch.from_numpy(s_pos[None]),
        "t_pcd": torch.from_numpy(t_pos[None]),
        "coarse_match_pred": torch.stack(
            [torch.zeros(k, dtype=torch.long),
             torch.arange(k), torch.arange(k)], dim=1),
    }
    with torch.no_grad():
        conf_ref = ref(data)[0].numpy()

    conf_got = np.asarray(apply_neco(params, jnp.array(vec6d),
                                     jnp.ones((k,), bool), ncfg))
    assert np.abs(conf_got - conf_ref).max() < 2e-4, \
        np.abs(conf_got - conf_ref).max()
