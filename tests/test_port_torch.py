"""Checkpoint-porting tests: synthetic torch-layout state_dicts round-trip."""
import numpy as np
import pytest

import jax

from deformationpyramid_tpu.match.kpconv import KPConvConfig
from deformationpyramid_tpu.match.matching import MatchingConfig
from deformationpyramid_tpu.match.outlier_rejection import NeCoConfig, init_neco
from deformationpyramid_tpu.match.pipeline import MatcherConfig, init_matcher
from deformationpyramid_tpu.match.port_torch import port_matcher, port_neco
from deformationpyramid_tpu.match.position_encoding import VolPEConfig
from deformationpyramid_tpu.match.transformer import TransformerConfig

FD = 96


def small_cfg():
    kcfg = KPConvConfig(first_subsampling_dl=0.05, first_feats_dim=32,
                        coarse_feature_dim=FD, fine_feature_dim=24)
    vol = VolPEConfig(feature_dim=FD, vol_origin=(-2.0, -2.0, -2.0))
    return MatcherConfig(
        kpfcn=kcfg,
        transformer=TransformerConfig(feature_dim=FD, n_head=4, vol=vol,
                                      matching=MatchingConfig(feature_dim=FD)),
        matching=MatchingConfig(feature_dim=FD), max_matches=32)


def synth_attention_sd(prefix, d, rng):
    return {
        f"{prefix}.q_proj.weight": rng.normal(size=(d, d)).astype(np.float32),
        f"{prefix}.k_proj.weight": rng.normal(size=(d, d)).astype(np.float32),
        f"{prefix}.v_proj.weight": rng.normal(size=(d, d)).astype(np.float32),
        f"{prefix}.merge.weight": rng.normal(size=(d, d)).astype(np.float32),
        f"{prefix}.mlp.0.weight": rng.normal(size=(2 * d, 2 * d)).astype(np.float32),
        f"{prefix}.mlp.2.weight": rng.normal(size=(d, 2 * d)).astype(np.float32),
        f"{prefix}.norm1.weight": rng.normal(size=(d,)).astype(np.float32),
        f"{prefix}.norm1.bias": rng.normal(size=(d,)).astype(np.float32),
        f"{prefix}.norm2.weight": rng.normal(size=(d,)).astype(np.float32),
        f"{prefix}.norm2.bias": rng.normal(size=(d,)).astype(np.float32),
    }


def test_port_matcher_maps_all_our_leaves():
    cfg = small_cfg()
    params = init_matcher(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    sd = {}
    # backbone: emit names for every leaf our tree has
    for i, blk in enumerate(params["backbone"]["encoder"]):
        pfx = f"backbone.encoder_blocks.{i}"
        sd[f"{pfx}.KPConv.weights"] = rng.normal(
            size=np.shape(blk["kpconv"]["weights"])).astype(np.float32)
        sd[f"{pfx}.KPConv.kernel_points"] = rng.normal(
            size=np.shape(blk["kpconv"]["kernel_points"])).astype(np.float32)
        for ours, theirs in (("unary1", "unary1"), ("unary2", "unary2"),
                             ("shortcut", "unary_shortcut")):
            if ours in blk:
                w = np.shape(blk[ours]["w"])
                sd[f"{pfx}.{theirs}.mlp.weight"] = rng.normal(
                    size=(w[1], w[0])).astype(np.float32)
    for i, blk in enumerate(params["backbone"]["decoder"]):
        if blk:
            w = np.shape(blk["w"])
            sd[f"backbone.decoder_blocks.{i}.mlp.weight"] = rng.normal(
                size=(w[1], w[0])).astype(np.float32)
    for name in ("coarse_out", "fine_out"):
        w = np.shape(params["backbone"][name]["w"])
        sd[f"backbone.{name}.weight"] = rng.normal(
            size=(w[1], w[0], 1)).astype(np.float32)
        sd[f"backbone.{name}.bias"] = rng.normal(size=(w[1],)).astype(np.float32)
    # transformer
    for i, lt in enumerate(cfg.transformer.layer_types):
        pfx = f"coarse_transformer.layers.{i}"
        if lt in ("self", "cross"):
            sd.update(synth_attention_sd(pfx, FD, rng))
        else:
            sd[f"{pfx}.0.src_proj.weight"] = rng.normal(size=(FD, FD)).astype(np.float32)
            sd[f"{pfx}.0.tgt_proj.weight"] = rng.normal(size=(FD, FD)).astype(np.float32)
    sd["coarse_matching.src_proj.weight"] = rng.normal(size=(FD, FD)).astype(np.float32)
    sd["coarse_matching.tgt_proj.weight"] = rng.normal(size=(FD, FD)).astype(np.float32)

    ported, report = port_matcher(sd, params, cfg.transformer.layer_types)
    assert report["missing"] == [], report["missing"]
    # dead reference weights are the only unused ones
    assert all("tgt_proj" in u for u in report["unused"]), report["unused"]
    # spot-check the transpose
    got = np.asarray(ported["matching"]["src_proj"])
    assert np.allclose(got, sd["coarse_matching.src_proj.weight"].T)
    got = np.asarray(ported["backbone"]["coarse_out"]["w"])
    assert np.allclose(got, sd["backbone.coarse_out.weight"][..., 0].T)


def test_port_neco_complete():
    cfg = NeCoConfig(feature_dim=48, n_head=4, num_layers=2)
    params = init_neco(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    sd = {
        "in_proj.weight": rng.normal(size=(48, 6)).astype(np.float32),
        "in_proj.bias": rng.normal(size=(48,)).astype(np.float32),
    }
    for i in range(2):
        sd.update(synth_attention_sd(f"_6D_geometry_layers.{i}", 48, rng))
    for name, (i_d, o_d) in (("classification.0", (48, 64)),
                             ("classification.2", (64, 32)),
                             ("classification.4", (32, 1))):
        sd[f"{name}.weight"] = rng.normal(size=(o_d, i_d)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(o_d,)).astype(np.float32)

    ported, report = port_neco(sd, params)
    assert report["missing"] == []
    assert report["unused"] == []
    assert np.allclose(np.asarray(ported["in_proj"]["w"]),
                       sd["in_proj.weight"].T)
    assert np.allclose(np.asarray(ported["cls3"]["b"]),
                       sd["classification.4.bias"])
