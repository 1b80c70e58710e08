"""NeCo training-step smoke test: loss decreases over steps."""
import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.data.collate import (
    build_pair_pyramid, calibrate_neighborhood_limits,
)
from deformationpyramid_tpu.data.synthetic import make_pair
from deformationpyramid_tpu.match.backbone import KPFCN_ARCHITECTURE
from deformationpyramid_tpu.match.kpconv import KPConvConfig
from deformationpyramid_tpu.match.landmark import LandmarkConfig, init_landmark_model
from deformationpyramid_tpu.match.matching import MatchingConfig
from deformationpyramid_tpu.match.outlier_rejection import NeCoConfig
from deformationpyramid_tpu.match.pipeline import MatcherConfig
from deformationpyramid_tpu.match.position_encoding import VolPEConfig
from deformationpyramid_tpu.match.transformer import TransformerConfig
from deformationpyramid_tpu.train.trainer import (
    TrainConfig, make_neco_train_step, make_optimizer, valid_gradient,
)

FD = 96


def test_neco_train_step_reduces_loss():
    kcfg = KPConvConfig(first_subsampling_dl=0.05, first_feats_dim=32,
                        coarse_feature_dim=FD, fine_feature_dim=24)
    vol = VolPEConfig(feature_dim=FD, vol_origin=(-2.0, -2.0, -2.0))
    lcfg = LandmarkConfig(
        matcher=MatcherConfig(
            kpfcn=kcfg,
            transformer=TransformerConfig(feature_dim=FD, n_head=4, vol=vol,
                                          matching=MatchingConfig(feature_dim=FD)),
            matching=MatchingConfig(feature_dim=FD), max_matches=32),
        neco=NeCoConfig(feature_dim=48, n_head=4, num_layers=2))

    src, tgt, flow = make_pair(n=400, seed=0, deform=0.05)
    limits = calibrate_neighborhood_limits([(src, tgt)], kcfg,
                                           KPFCN_ARCHITECTURE)
    pyr = build_pair_pyramid(src, tgt, kcfg, KPFCN_ARCHITECTURE, limits)
    pyrd = {"points": [jnp.array(p) for p in pyr.points],
            "valids": [jnp.array(v) for v in pyr.valids],
            "neighbors": [jnp.array(x) for x in pyr.neighbors],
            "pools": [jnp.array(x) for x in pyr.pools],
            "upsamples": [jnp.array(x) for x in pyr.upsamples],
            "features": jnp.array(pyr.features)}
    n_c = len(pyr.points[2])
    coarse_flow = jnp.zeros((n_c, 3))

    params = init_landmark_model(jax.random.key(0), lcfg)
    tcfg = TrainConfig(optimizer="Adam", lr=1e-3, max_epoch=1)
    opt = make_optimizer(tcfg, steps_per_epoch=1)
    step = make_neco_train_step(params["matcher"], lcfg, opt)
    opt_state = opt.init(params["neco"])

    neco = params["neco"]
    losses = []
    for _ in range(5):
        neco, opt_state, loss, info, ok = step(
            neco, opt_state, pyrd, jnp.int32(pyr.src_lengths[2]),
            jnp.int32(pyr.tgt_lengths[2]), coarse_flow,
            jnp.eye(3), jnp.zeros((3, 1)))
        assert bool(ok)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_matcher_train_step_reduces_loss():
    """MatchMotionLoss step trains the full matcher end-to-end (focal +
    motion loss, reference lepard/loss.py:80-188): loss decreases over a
    few steps on one pair with GT coarse matches built the reference way
    (blend flow -> GT-warp -> mutual NN, dataloader.py:552-562)."""
    from deformationpyramid_tpu.data.correspondence_utils import (
        blend_scene_flow, mutual_nn_correspondence,
    )
    from deformationpyramid_tpu.train.trainer import make_matcher_train_step

    kcfg = KPConvConfig(first_subsampling_dl=0.05, first_feats_dim=32,
                        coarse_feature_dim=FD, fine_feature_dim=24)
    vol = VolPEConfig(feature_dim=FD, vol_origin=(-2.0, -2.0, -2.0))
    lcfg = LandmarkConfig(
        matcher=MatcherConfig(
            kpfcn=kcfg,
            transformer=TransformerConfig(feature_dim=FD, n_head=4, vol=vol,
                                          matching=MatchingConfig(feature_dim=FD)),
            matching=MatchingConfig(feature_dim=FD), max_matches=32))

    src, tgt, flow = make_pair(n=400, seed=1, deform=0.05)
    limits = calibrate_neighborhood_limits([(src, tgt)], kcfg,
                                           KPFCN_ARCHITECTURE)
    pyr = build_pair_pyramid(src, tgt, kcfg, KPFCN_ARCHITECTURE, limits)
    pyrd = {"points": [jnp.array(p) for p in pyr.points],
            "valids": [jnp.array(v) for v in pyr.valids],
            "neighbors": [jnp.array(x) for x in pyr.neighbors],
            "pools": [jnp.array(x) for x in pyr.pools],
            "upsamples": [jnp.array(x) for x in pyr.upsamples],
            "features": jnp.array(pyr.features)}
    cl = lcfg.matcher.coarse_level
    s_len, t_len = pyr.src_lengths[cl], pyr.tgt_lengths[cl]
    coarse = pyr.points[cl]
    c_src, c_tgt = coarse[:s_len], coarse[s_len:s_len + t_len]
    c_flow = blend_scene_flow(c_src, src, flow)
    corr = mutual_nn_correspondence(c_src + c_flow, c_tgt,
                                    search_radius=0.15)
    assert len(corr) > 3  # the synthetic pair must give real GT matches
    cap = max(s_len, t_len)
    match_gt = np.zeros((cap, 2), np.int64)
    match_gt_valid = np.zeros((cap,), bool)
    match_gt[:len(corr)] = corr[:cap]
    match_gt_valid[:len(corr)] = True
    coarse_flow = np.zeros((cap, 3), np.float32)
    coarse_flow[:s_len] = c_flow

    params = init_landmark_model(jax.random.key(0), lcfg)
    tcfg = TrainConfig(optimizer="Adam", lr=1e-3, max_epoch=1)
    opt = make_optimizer(tcfg, steps_per_epoch=1)
    step = make_matcher_train_step(lcfg, opt, s_cap=cap, t_cap=cap)
    mp = params["matcher"]
    opt_state = opt.init(mp)
    losses = []
    for _ in range(5):
        mp, opt_state, loss, info, ok = step(
            mp, opt_state, pyrd, jnp.int32(s_len), jnp.int32(t_len),
            jnp.array(match_gt), jnp.array(match_gt_valid),
            jnp.array(coarse_flow), jnp.eye(3), jnp.zeros((3, 1)))
        assert bool(ok)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_valid_gradient_guard():
    good = {"a": jnp.ones((3,)), "b": [jnp.zeros((2, 2))]}
    bad = {"a": jnp.array([1.0, jnp.nan, 2.0]), "b": [jnp.zeros((2, 2))]}
    assert bool(valid_gradient(good))
    assert not bool(valid_gradient(bad))


def test_inlier_label_threshold_is_4cm():
    """The LABEL threshold is the reference's 4 cm
    (configs/train/4dmatch.yaml:28), not 10 cm: a match 6 cm off the GT
    warp must label as an outlier, else close-displacement regimes go
    single-class and the balanced BCE's gradient vanishes (pos_rate -> 1
    scales the whole loss by 1-pos_rate; the round-4 flat-confidence
    finding)."""
    from deformationpyramid_tpu.match.losses import (
        balanced_bce, compute_inlier_mask)

    s = jnp.zeros((4, 3), jnp.float32)
    t = jnp.array([[0.0, 0, 0], [0.06, 0, 0], [0.03, 0, 0], [0.5, 0, 0]],
                  jnp.float32)
    vec6d = jnp.concatenate([s, t], axis=1)
    idx = jnp.stack([jnp.arange(4), jnp.arange(4)], axis=1)
    valid = jnp.ones(4, bool)
    labels = compute_inlier_mask(vec6d, valid, idx, s, jnp.zeros_like(s),
                                 jnp.eye(3), jnp.zeros((3, 1)))
    assert labels.tolist() == [True, False, True, False]

    # single-class labels collapse the balanced BCE to ~0 with ~0 gradient
    conf = jnp.full((4,), 0.5)
    lo = balanced_bce(conf, jnp.ones(4, bool), valid)
    hi = balanced_bce(conf, jnp.array([True, False, True, False]), valid)
    assert float(lo) < 0.05 * float(hi)


def test_neco_learns_to_reject_planted_outliers():
    """Multi-step training lifts post-filter IR well above the unfiltered
    rate on a synthetic task with 40% planted outlier matches."""
    import optax
    from deformationpyramid_tpu.match.losses import neco_loss
    from deformationpyramid_tpu.match.outlier_rejection import apply_neco, init_neco

    cfg = NeCoConfig(feature_dim=48, n_head=4, num_layers=2)
    params = init_neco(jax.random.key(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        k = 48
        s = r.normal(size=(k, 3)).astype(np.float32) * 0.3
        t = s + 0.01 * r.normal(size=(k, 3)).astype(np.float32)
        out = r.random(k) < 0.4
        t[out] += r.normal(size=(int(out.sum()), 3)).astype(np.float32) * 0.5
        return (jnp.array(np.concatenate([s, t], 1)),
                jnp.array(np.stack([np.arange(k), np.arange(k)], 1)),
                jnp.array(s))

    @jax.jit
    def step(params, opt_state, vec6d, idx, s):
        def loss_fn(p):
            conf = apply_neco(p, vec6d, jnp.ones(len(vec6d), bool), cfg)
            return neco_loss(conf, vec6d, jnp.ones(len(vec6d), bool), idx, s,
                             jnp.zeros_like(s), jnp.eye(3), jnp.zeros((3, 1)))
        (loss, info), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, info

    info = None
    for i in range(60):
        vec6d, idx, s = make_batch(i % 12)
        params, opt_state, info = step(params, opt_state, vec6d, idx, s)
    assert float(info["IR_neco"]) > float(info["IR_lepard"]) + 0.1


def test_multistep_lr_schedule_values():
    from deformationpyramid_tpu.train.trainer import make_schedule

    cfg = TrainConfig(scheduler="MultiStepLR", lr=1.0,
                      lr_milestones=(2, 4), scheduler_gamma=0.1)
    sched = make_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert float(sched(19)) == 1.0
    assert abs(float(sched(20)) - 0.1) < 1e-7
    assert abs(float(sched(39)) - 0.1) < 1e-7
    assert abs(float(sched(40)) - 0.01) < 1e-7


def _tiny_lcfg():
    fd = 24
    kcfg = KPConvConfig(first_subsampling_dl=0.1, first_feats_dim=8,
                        coarse_feature_dim=fd, fine_feature_dim=8)
    vol = VolPEConfig(feature_dim=fd, vol_origin=(-2.0, -2.0, -2.0))
    return LandmarkConfig(
        matcher=MatcherConfig(
            kpfcn=kcfg,
            transformer=TransformerConfig(feature_dim=fd, n_head=2, vol=vol,
                                          matching=MatchingConfig(feature_dim=fd)),
            matching=MatchingConfig(feature_dim=fd), max_matches=16),
        neco=NeCoConfig(feature_dim=12, n_head=2, num_layers=1))


def _tiny_batch(lcfg, seed):
    src, tgt, flow = make_pair(n=120, seed=seed, deform=0.05)
    limits = calibrate_neighborhood_limits([(src, tgt)], lcfg.matcher.kpfcn,
                                           KPFCN_ARCHITECTURE)
    pyr = build_pair_pyramid(src, tgt, lcfg.matcher.kpfcn,
                             KPFCN_ARCHITECTURE, limits)
    pyrd = {"points": [jnp.array(p) for p in pyr.points],
            "valids": [jnp.array(v) for v in pyr.valids],
            "neighbors": [jnp.array(x) for x in pyr.neighbors],
            "pools": [jnp.array(x) for x in pyr.pools],
            "upsamples": [jnp.array(x) for x in pyr.upsamples],
            "features": jnp.array(pyr.features)}
    n_c = len(pyr.points[2])
    return {"pyramid": pyrd,
            "src_len_c": jnp.int32(pyr.src_lengths[2]),
            "tgt_len_c": jnp.int32(pyr.tgt_lengths[2]),
            "coarse_flow": jnp.zeros((n_c, 3)),
            "gt_rot": jnp.eye(3), "gt_trn": jnp.zeros((3, 1))}


def test_iter_size_accumulation_matches_summed_grads():
    """iter_size=k accumulation == one optimizer step on the SUM of the k
    per-batch gradients (the reference never scales by iter_size,
    lib/trainer.py:195-201)."""
    import optax
    from deformationpyramid_tpu.train.trainer import (
        make_neco_accum_fns, make_neco_loss_fn,
    )

    lcfg = _tiny_lcfg()
    params = init_landmark_model(jax.random.key(0), lcfg)
    b0, b1 = _tiny_batch(lcfg, 0), _tiny_batch(lcfg, 1)
    args = lambda b: (b["pyramid"], b["src_len_c"], b["tgt_len_c"],
                      b["coarse_flow"], b["gt_rot"], b["gt_trn"])

    opt = optax.sgd(0.05)
    opt_state = opt.init(params["neco"])
    grads_fn, apply_fn = make_neco_accum_fns(params["matcher"], lcfg, opt)

    accum = jax.tree.map(jnp.zeros_like, params["neco"])
    accum, l0, _ = grads_fn(params["neco"], accum, *args(b0))
    # params must not move between accumulation sub-steps
    accum, l1, _ = grads_fn(params["neco"], accum, *args(b1))
    new_params, _, accum_after, ok = apply_fn(params["neco"], opt_state, accum)
    assert bool(ok)
    assert all(float(jnp.abs(x).max()) == 0.0
               for x in jax.tree.leaves(accum_after))

    # manual: sum of the two per-batch grads through the same optimizer
    loss_fn = make_neco_loss_fn(params["matcher"], lcfg)
    g0 = jax.grad(loss_fn, has_aux=True)(params["neco"], *args(b0))[0]
    g1 = jax.grad(loss_fn, has_aux=True)(params["neco"], *args(b1))[0]
    gsum = jax.tree.map(jnp.add, g0, g1)
    upd, _ = opt.update(gsum, opt.init(params["neco"]), params["neco"])
    expect = optax.apply_updates(params["neco"], upd)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         new_params, expect)
    assert max(jax.tree.leaves(diffs)) < 1e-6


def test_train_neco_val_selection_and_history(tmp_path):
    from deformationpyramid_tpu.train.trainer import train_neco
    import json

    lcfg = _tiny_lcfg()
    params = init_landmark_model(jax.random.key(1), lcfg)
    batches = [_tiny_batch(lcfg, s) for s in (0, 1)]
    val = [_tiny_batch(lcfg, 2)]
    cfg = TrainConfig(optimizer="Adam", lr=1e-3, iter_size=2, max_epoch=2,
                      snapshot_dir=str(tmp_path / "snap"))
    out = train_neco(params["matcher"], params["neco"], lcfg, cfg,
                     lambda: iter(batches), steps_per_epoch=2,
                     val_batches=lambda: iter(val), log_fn=lambda *_: None)
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         out, params["neco"])
    assert max(jax.tree.leaves(moved)) > 0.0
    assert (tmp_path / "snap" / "model_best_loss.npz").exists()
    rows = [json.loads(l) for l in
            (tmp_path / "snap" / "history.jsonl").read_text().splitlines()]
    assert [r["phase"] for r in rows] == ["train", "val", "train", "val"]
    assert all(np.isfinite(r["loss"]) and np.isfinite(r["lr"]) for r in rows)


def test_make_matcher_batch_stream(tmp_path):
    """The train_matcher CLI's batch builder: pow2 symmetric caps, GT
    matches that geometrically correspond under the stored (rot, trans),
    coarse flow restricted to true source rows, and a cache that replays
    identical batches across epochs."""
    from deformationpyramid_tpu.cli.train_matcher import (
        _pow2, make_matcher_batch_stream,
    )
    from deformationpyramid_tpu.data.fourdmatch import FourDMatchDataset
    from tests.test_eval_cli import write_synthetic_4dmatch

    root = str(tmp_path / "split")
    write_synthetic_4dmatch(root, "train", n_pairs=2, n_pts=350)
    ds = FourDMatchDataset(root, "train", augment=False)
    lcfg = _tiny_lcfg()
    kcfg = lcfg.matcher.kpfcn
    limits = calibrate_neighborhood_limits(
        [(ds[0].src, ds[0].tgt)], kcfg, KPFCN_ARCHITECTURE)
    stream = make_matcher_batch_stream(ds, lcfg, limits,
                                       coarse_match_radius=0.3)

    batches = list(stream())
    assert len(batches) == 2
    cl = lcfg.matcher.coarse_level
    for b, i in zip(batches, range(2)):
        s_len = int(b["src_len_c"])
        t_len = int(b["tgt_len_c"])
        cap = b["s_cap"]
        assert b["t_cap"] == cap                      # symmetric caps
        assert cap == _pow2(max(s_len, t_len))        # pow2 bucketing
        valid = np.asarray(b["match_gt_valid"])
        gt = np.asarray(b["match_gt"])
        assert valid.any(), "no GT coarse matches built"
        assert (gt[valid, 0] < s_len).all()
        assert (gt[valid, 1] < t_len).all()
        # geometric consistency: GT-warped matched src coarse points land
        # within the search radius of their matched tgt coarse points
        coarse = np.asarray(b["pyramid"]["points"][cl])
        c_src = coarse[:s_len]
        c_tgt = coarse[s_len:s_len + t_len]
        c_flow = np.asarray(b["coarse_flow"])[:s_len]
        rot = np.asarray(b["gt_rot"])
        trn = np.asarray(b["gt_trn"])
        warped = (rot @ (c_src + c_flow).T + trn).T
        d = np.linalg.norm(warped[gt[valid, 0]] - c_tgt[gt[valid, 1]],
                           axis=-1)
        assert (d < 0.3).all(), d.max()
        # padded coarse-flow rows stay zero
        assert not np.asarray(b["coarse_flow"])[s_len:].any()

    # cache=True replays the same batch objects (no re-collate per epoch)
    again = list(stream())
    assert all(a is b for a, b in zip(batches, again))
