"""Tests for the LNDP correspondence stack (KPConv -> matcher -> NeCo)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deformationpyramid_tpu.data.collate import (
    build_pair_pyramid, calibrate_neighborhood_limits, grid_subsample,
    radius_search,
)
from deformationpyramid_tpu.data.synthetic import make_pair
from deformationpyramid_tpu.match.backbone import KPFCN_ARCHITECTURE
from deformationpyramid_tpu.match.kpconv import KPConvConfig
from deformationpyramid_tpu.match.landmark import (
    LandmarkConfig, init_landmark_model, landmark_inference,
)
from deformationpyramid_tpu.match.losses import (
    MatchLossConfig, balanced_bce, compute_inlier_mask, match_motion_loss,
    matches_to_conf_gt, neco_loss,
)
from deformationpyramid_tpu.match.matching import (
    MatchingConfig, extract_matches, init_matching, log_optimal_transport,
)
from deformationpyramid_tpu.match.outlier_rejection import NeCoConfig, apply_neco, init_neco
from deformationpyramid_tpu.match.pipeline import MatcherConfig, apply_matcher, init_matcher
from deformationpyramid_tpu.match.position_encoding import (
    VolPEConfig, embed_rotary, volumetric_pe,
)
from deformationpyramid_tpu.match.transformer import TransformerConfig


FD = 96  # small feature dim divisible by 6 and n_head


def small_matcher_cfg():
    kcfg = KPConvConfig(first_subsampling_dl=0.05, first_feats_dim=32,
                        coarse_feature_dim=FD, fine_feature_dim=24)
    vol = VolPEConfig(feature_dim=FD, vol_origin=(-2.0, -2.0, -2.0))
    return MatcherConfig(
        kpfcn=kcfg,
        transformer=TransformerConfig(feature_dim=FD, n_head=4, vol=vol,
                                      matching=MatchingConfig(feature_dim=FD)),
        matching=MatchingConfig(feature_dim=FD),
        max_matches=64)


def make_pyramid(cfg, n=400, seed=0, deform=0.05):
    src, tgt, flow = make_pair(n=n, seed=seed, deform=deform)
    limits = calibrate_neighborhood_limits([(src, tgt)], cfg.kpfcn,
                                           KPFCN_ARCHITECTURE)
    pyr = build_pair_pyramid(src, tgt, cfg.kpfcn, KPFCN_ARCHITECTURE, limits)
    pyrd = {"points": [jnp.array(p) for p in pyr.points],
            "valids": [jnp.array(v) for v in pyr.valids],
            "neighbors": [jnp.array(x) for x in pyr.neighbors],
            "pools": [jnp.array(x) for x in pyr.pools],
            "upsamples": [jnp.array(x) for x in pyr.upsamples],
            "features": jnp.array(pyr.features)}
    return src, tgt, flow, pyr, pyrd


# ---------------- collate primitives ----------------

def test_grid_subsample_barycenters():
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3],   # same voxel @ dl=0.5
                    [0.9, 0.9, 0.9]], np.float32)
    sub, _ = grid_subsample(pts, 0.5)
    assert len(sub) == 2
    assert np.allclose(sub[0], [0.2, 0.2, 0.2], atol=1e-6)
    assert np.allclose(sub[1], [0.9, 0.9, 0.9], atol=1e-6)


def test_radius_search_shadow_and_order():
    sup = np.array([[0, 0, 0], [1, 0, 0], [0.1, 0, 0]], np.float32)
    q = np.array([[0, 0, 0]], np.float32)
    idx = radius_search(q, sup, radius=0.5, max_k=3)
    # distance ordered: self (0), then 0.1 away (2); index 3 = shadow
    assert idx[0, 0] == 0 and idx[0, 1] == 2 and idx[0, 2] == 3


def test_pyramid_pow2_pad_equals_explicit_rebuild():
    """pad_to="pow2" must be byte-identical to the former two-pass idiom
    (build unpadded to measure level sizes, rebuild with explicit pow2
    pads) — it replaces that idiom at every CLI call site with ONE native
    collate pass."""
    cfg = small_matcher_cfg()
    src, tgt, _ = make_pair(n=700, seed=3, deform=0.05)
    limits = calibrate_neighborhood_limits([(src, tgt)], cfg.kpfcn,
                                           KPFCN_ARCHITECTURE)
    raw = build_pair_pyramid(src, tgt, cfg.kpfcn, KPFCN_ARCHITECTURE, limits)

    def pow2(n, minimum=512):
        b = minimum
        while b < n:
            b *= 2
        return b

    pads = [pow2(len(p)) for p in raw.points]
    two_pass = build_pair_pyramid(src, tgt, cfg.kpfcn, KPFCN_ARCHITECTURE,
                                  limits, pad_to=pads)
    one_pass = build_pair_pyramid(src, tgt, cfg.kpfcn, KPFCN_ARCHITECTURE,
                                  limits, pad_to="pow2")
    assert one_pass.src_lengths == two_pass.src_lengths
    assert one_pass.tgt_lengths == two_pass.tgt_lengths
    for a, b in zip(one_pass.points, two_pass.points):
        assert a.shape == b.shape and np.array_equal(a, b)
        assert (len(a) & (len(a) - 1)) == 0 and len(a) >= 512  # pow2 bucket
    for field in ("valids", "neighbors", "pools", "upsamples"):
        for a, b in zip(getattr(one_pass, field), getattr(two_pass, field)):
            assert np.array_equal(a, b), field
    assert np.array_equal(one_pass.features, two_pass.features)


# ---------------- position encoding ----------------

def test_rotary_preserves_norm_and_inner_product_shift():
    cfg = VolPEConfig(feature_dim=12, pe_type="rotary", vol_origin=(0, 0, 0))
    x = jnp.array(np.random.default_rng(0).normal(size=(5, 12)), jnp.float32)
    pts = jnp.array(np.random.default_rng(1).normal(size=(5, 3)), jnp.float32)
    pe = volumetric_pe(pts, cfg)
    rx = embed_rotary(x, pe[..., 0], pe[..., 1])
    # rotation preserves norms
    assert np.allclose(np.linalg.norm(np.asarray(rx), axis=-1),
                       np.linalg.norm(np.asarray(x), axis=-1), atol=1e-4)


def test_sinusoidal_pe_shape():
    cfg = VolPEConfig(feature_dim=12, pe_type="sinusoidal", vol_origin=(0, 0, 0))
    pe = volumetric_pe(jnp.zeros((7, 3)), cfg)
    assert pe.shape == (7, 12)


# ---------------- matching ----------------

def test_log_optimal_transport_is_normalized():
    rng = np.random.default_rng(0)
    scores = jnp.array(rng.normal(size=(6, 8)), jnp.float32)
    sm = jnp.ones((6,), bool)
    tm = jnp.ones((8,), bool)
    z = log_optimal_transport(scores, jnp.float32(1.0), 30, sm, tm)
    # reference convention (matching.py:36-38): after the +log(m+n) shift
    # each regular row/col of exp(Z) sums to ~1, total mass = m+n
    a = np.asarray(jnp.exp(z))
    assert np.allclose(a[:6].sum(axis=1), 1.0, atol=0.02)
    assert np.allclose(a[:, :8].sum(axis=0), 1.0, atol=0.02)
    assert abs(a.sum() - 14.0) < 0.2


def test_extract_matches_mutual_max():
    conf = jnp.array([[0.9, 0.1], [0.2, 0.8], [0.3, 0.85]])
    idx, score, valid = extract_matches(conf, thr=0.5, k=4)
    got = {(int(i), int(j)) for (i, j), v in zip(np.asarray(idx),
                                                 np.asarray(valid)) if v}
    # (0,0) mutual; (2,1) beats (1,1) in column 1 => (1,1) not mutual
    assert got == {(0, 0), (2, 1)}


def test_extract_matches_all_equals_reference_semantics():
    """Uncapped extraction == brute-force 'all mutual-max above thr'
    (reference matching.py:71-88), on random confs with padded rows."""
    from deformationpyramid_tpu.match.matching import extract_matches_all

    rng = np.random.default_rng(5)
    for trial in range(5):
        s, t = rng.integers(4, 40), rng.integers(4, 40)
        conf = rng.uniform(size=(s, t)).astype(np.float32)
        conf[s - 2:, :] = 0.0  # padded rows
        conf[:, t - 1:] = 0.0
        thr = 0.5
        mask = (conf > thr) \
            & (conf == conf.max(axis=1, keepdims=True)) \
            & (conf == conf.max(axis=0, keepdims=True))
        want = set(zip(*np.nonzero(mask)))
        idx, score, valid = extract_matches_all(jnp.asarray(conf), thr)
        got = {(int(i), int(j)) for (i, j), v in zip(np.asarray(idx),
                                                     np.asarray(valid)) if v}
        assert got == want, f"trial {trial}"
        # scores of valid slots match the conf entries
        for (i, j), sc, v in zip(np.asarray(idx), np.asarray(score),
                                 np.asarray(valid)):
            if v:
                assert sc == conf[i, j]


def test_uncapped_matcher_capacity_scales_with_bucket():
    """max_matches=None: the match capacity follows the coarse cap, so
    recall is no longer structurally frozen at k/|GT| (VERDICT r3 #2)."""
    import dataclasses as _dc

    cfg = small_matcher_cfg()
    cfg = _dc.replace(cfg, max_matches=None)
    src, tgt, flow, pyr, pyrd = make_pyramid(cfg)
    params = init_matcher(jax.random.key(0), cfg)
    data = apply_matcher(params, pyrd, jnp.int32(pyr.src_lengths[2]),
                         jnp.int32(pyr.tgt_lengths[2]), cfg)
    n_c = pyrd["points"][2].shape[0]
    assert data["match_idx"].shape == (n_c, 2)
    assert data["vec_6d"].shape == (n_c, 6)
    # mutual-max: at most one valid match per src row, none in padding
    mv = np.asarray(data["match_valid"])
    assert mv[pyr.src_lengths[2]:].sum() == 0


# ---------------- matcher pipeline ----------------

def test_matcher_forward_shapes_and_finiteness():
    cfg = small_matcher_cfg()
    src, tgt, flow, pyr, pyrd = make_pyramid(cfg)
    params = init_matcher(jax.random.key(0), cfg)
    data = apply_matcher(params, pyrd, jnp.int32(pyr.src_lengths[2]),
                         jnp.int32(pyr.tgt_lengths[2]), cfg)
    n_c = pyrd["points"][2].shape[0]
    assert data["conf_matrix_pred"].shape == (n_c, n_c)
    assert np.isfinite(np.asarray(data["conf_matrix_pred"])).all()
    assert len(data["position_layers"]) == 1
    assert np.isfinite(np.asarray(data["R_s2t_pred"])).all()
    # conf zero outside valid region
    cm = np.asarray(data["conf_matrix_pred"])
    assert cm[pyr.src_lengths[2]:, :].max() == 0.0


def test_matcher_loss_runs_and_decreases_with_training_signal():
    cfg = small_matcher_cfg()
    src, tgt, flow, pyr, pyrd = make_pyramid(cfg)
    params = init_matcher(jax.random.key(0), cfg)
    s_len, t_len = pyr.src_lengths[2], pyr.tgt_lengths[2]
    n_c = pyrd["points"][2].shape[0]

    # GT matches: identity-ish nearest pairs from the coarse clouds
    coarse = np.asarray(pyrd["points"][2])
    s_pts = coarse[:s_len]
    t_pts = coarse[s_len:s_len + t_len]
    d = ((s_pts[:, None] - t_pts[None]) ** 2).sum(-1)
    gt = np.stack([np.arange(s_len), d.argmin(1)], 1)[:32]
    gt_pad = np.zeros((64, 2), np.int64)
    gt_pad[:len(gt)] = gt
    gt_valid = np.arange(64) < len(gt)

    coarse_flow = jnp.zeros((n_c, 3))

    def loss_fn(p):
        data = apply_matcher(p, pyrd, jnp.int32(s_len), jnp.int32(t_len), cfg)
        loss, info = match_motion_loss(
            data, jnp.array(gt_pad), jnp.array(gt_valid),
            coarse_flow[:data["s_pcd"].shape[0]],
            jnp.eye(3), jnp.zeros((3, 1)), MatchLossConfig())
        return loss

    l0, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    gnorm = float(optax_global_norm(g))
    assert np.isfinite(gnorm) and gnorm > 0
    # one SGD step reduces the loss
    import optax
    p2 = jax.tree.map(lambda p, gg: p - 1e-3 * gg, params, g)
    l1 = float(loss_fn(p2))
    assert l1 < float(l0)


def optax_global_norm(tree):
    import optax
    return optax.global_norm(tree)


# ---------------- NeCo ----------------

def test_neco_confidence_and_loss():
    cfg = NeCoConfig(feature_dim=48, n_head=4, num_layers=2)
    params = init_neco(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    k = 32
    s = rng.normal(size=(k, 3)).astype(np.float32)
    vec6d = jnp.array(np.concatenate([s, s + 0.01], 1))
    mask = jnp.array(np.arange(k) < 24)
    conf = apply_neco(params, vec6d, mask, cfg)
    assert conf.shape == (k,)
    c = np.asarray(conf)
    assert ((c >= 0) & (c <= 1)).all()
    assert (c[24:] == 0).all()  # masked rows zeroed

    # loss with perfect-inlier labels
    match_idx = jnp.array(np.stack([np.arange(k), np.arange(k)], 1))
    loss, info = neco_loss(conf, vec6d, mask, match_idx, jnp.array(s),
                           jnp.zeros((k, 3)), jnp.eye(3), jnp.zeros((3, 1)))
    assert np.isfinite(float(loss))
    assert float(info["IR_lepard"]) == 1.0  # all matches are true inliers


def test_balanced_bce_weights_classes():
    pred = jnp.array([0.9, 0.9, 0.1, 0.9])
    labels = jnp.array([1.0, 1.0, 0.0, 0.0])
    valid = jnp.ones((4,), bool)
    loss = balanced_bce(pred, labels, valid)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_inlier_mask_definition():
    s = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    vec6d = jnp.array([[0.0, 0, 0, 0.0, 0, 0], [1.0, 0, 0, 5.0, 0, 0]])
    idx = jnp.array([[0, 0], [1, 1]])
    valid = jnp.ones((2,), bool)
    m = compute_inlier_mask(vec6d, valid, idx, s, jnp.zeros((2, 3)),
                            jnp.eye(3), jnp.zeros((3, 1)), inlier_thr=0.1)
    assert bool(m[0]) and not bool(m[1])


# ---------------- landmark glue + registration handoff ----------------

def test_landmark_inference_feeds_registration():
    cfg = small_matcher_cfg()
    lcfg = LandmarkConfig(matcher=cfg,
                          neco=NeCoConfig(feature_dim=48, n_head=4, num_layers=2),
                          inlier_thr=0.0, reject_outliers=False)
    src, tgt, flow, pyr, pyrd = make_pyramid(cfg)
    params = init_landmark_model(jax.random.key(1), lcfg)
    data = landmark_inference(params, pyrd, jnp.int32(pyr.src_lengths[2]),
                              jnp.int32(pyr.tgt_lengths[2]), lcfg)
    assert data["ldmk_s"].shape == (cfg.max_matches, 3)
    n_ldmk = int(data["ldmk_valid"].sum())
    assert n_ldmk > 0

    # hand off to the landmark-mode registration solver
    from deformationpyramid_tpu.models.pyramid import NDPConfig
    from deformationpyramid_tpu.solve.registration import SolverConfig, register_pair
    scfg = SolverConfig(pyramid=NDPConfig(m=2, k0=-3, depth=2, width=16),
                        iters=10, samples=64, use_pallas=False)
    warped, stats = jax.jit(
        lambda k, s, t, ls, lt, lv: register_pair(
            k, s, t, scfg, src_ldmk=ls, tgt_ldmk=lt, ldmk_valid=lv))(
        jax.random.key(2), jnp.array(src), jnp.array(tgt),
        data["ldmk_s"], data["ldmk_t"], data["ldmk_valid"])
    assert np.isfinite(np.asarray(warped)).all()


def test_config_loader_tree():
    from deformationpyramid_tpu.match.config_loader import landmark_config_from_yaml

    lcfg = landmark_config_from_yaml("config/configs/correspondence.yaml")
    assert lcfg.matcher.transformer.feature_dim == 528
    assert lcfg.matcher.coarse_level == 2
    assert lcfg.neco.num_layers == 9 and lcfg.neco.feature_dim == 144
    assert lcfg.matcher.transformer.vol.vol_origin == (-3.6, -2.4, 1.14)


# ---------------- positioning ablations ----------------

def test_rand_rot_pcd_is_rigid_about_masked_centroid():
    from deformationpyramid_tpu.match.transformer import rand_rot_pcd

    rng = np.random.default_rng(3)
    pcd = jnp.array(rng.normal(size=(10, 3)), jnp.float32)
    mask = jnp.array([True] * 7 + [False] * 3)
    out = np.asarray(rand_rot_pcd(jax.random.key(0), pcd, mask))
    valid = np.asarray(jnp.where(mask[:, None], pcd, 0.0))[:7]
    # rigid: pairwise distances among valid points preserved
    d_in = np.linalg.norm(valid[:, None] - valid[None], axis=-1)
    d_out = np.linalg.norm(out[:7][:, None] - out[:7][None], axis=-1)
    assert np.allclose(d_in, d_out, atol=1e-4)
    # the masked centroid is a fixed point of the repositioning
    assert np.allclose(valid.mean(0), out[:7].mean(0), atol=1e-4)
    # rotation actually moved the cloud
    assert np.abs(out[:7] - valid).max() > 1e-3


def test_transformer_randSO3_positioning_runs():
    from deformationpyramid_tpu.match.transformer import (
        apply_transformer, init_transformer,
    )

    fd = 12
    cfg = TransformerConfig(
        feature_dim=fd, n_head=2, positioning_type="randSO3",
        vol=VolPEConfig(feature_dim=fd, vol_origin=(-2.0, -2.0, -2.0)),
        matching=MatchingConfig(feature_dim=fd))
    params = init_transformer(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    sf = jnp.array(rng.normal(size=(9, fd)), jnp.float32)
    tf = jnp.array(rng.normal(size=(11, fd)), jnp.float32)
    sp = jnp.array(rng.normal(size=(9, 3)), jnp.float32)
    tp = jnp.array(rng.normal(size=(11, 3)), jnp.float32)
    sm = jnp.ones((9,), bool)
    tm = jnp.ones((11,), bool)

    with pytest.raises(ValueError):
        apply_transformer(params, sf, tf, sp, tp, sm, tm, cfg)

    out_sf, out_tf, spe, tpe, layers = apply_transformer(
        params, sf, tf, sp, tp, sm, tm, cfg, key=jax.random.key(1))
    assert layers == []  # randSO3 layers carry no procrustes outputs
    for arr in (out_sf, out_tf, spe, tpe):
        assert np.isfinite(np.asarray(arr)).all()
    # a different key repositions differently -> different src PE
    _, _, spe2, _, _ = apply_transformer(
        params, sf, tf, sp, tp, sm, tm, cfg, key=jax.random.key(2))
    assert np.abs(np.asarray(spe) - np.asarray(spe2)).max() > 1e-5


def test_matcher_bfloat16_inference_mode_close_to_f32():
    """compute_dtype='bfloat16' (bf16 matmul operands, f32 accumulation)
    must track the f32 forward: high conf-matrix correlation and a close
    rigid fit. Default f32 path is untouched (bit-level reference parity)."""
    import dataclasses

    cfg = small_matcher_cfg()
    src, tgt, flow, pyr, pyrd = make_pyramid(cfg)
    params = init_matcher(jax.random.key(0), cfg)
    sl, tl = jnp.int32(pyr.src_lengths[2]), jnp.int32(pyr.tgt_lengths[2])
    outs = {}
    for dt in ("float32", "bfloat16"):
        c = dataclasses.replace(
            cfg,
            transformer=dataclasses.replace(cfg.transformer,
                                            compute_dtype=dt),
            matching=dataclasses.replace(cfg.matching, compute_dtype=dt))
        data = apply_matcher(params, pyrd, sl, tl, c)
        outs[dt] = (np.asarray(data["conf_matrix_pred"]),
                    np.asarray(data["R_s2t_pred"]))
    a, b = outs["float32"][0].ravel(), outs["bfloat16"][0].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
    assert np.abs(outs["float32"][1] - outs["bfloat16"][1]).max() < 0.05
