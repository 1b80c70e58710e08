"""End-to-end test of the 3DMatch rigid-registration eval (small dims, CPU).

Composes the synthetic 3DMatch fragment suite
(``data/synthetic.py:write_3dmatch_suite``) with the eval driver
(``cli/eval_3dmatch.py``): matcher -> RANSAC -> registration recall, the
path the reference describes but never wires (its tester dispatch returns
``None #_3DMatchTester``, ``correspondence/lib/tester.py:178-181``).
"""
import json

import numpy as np

import jax

from deformationpyramid_tpu.data.synthetic import write_3dmatch_suite
from deformationpyramid_tpu.data.threedmatch import ThreeDMatchDataset
from deformationpyramid_tpu.match.kpconv import KPConvConfig
from deformationpyramid_tpu.match.landmark import LandmarkConfig, init_landmark_model
from deformationpyramid_tpu.match.matching import MatchingConfig
from deformationpyramid_tpu.match.outlier_rejection import NeCoConfig
from deformationpyramid_tpu.match.pipeline import MatcherConfig
from deformationpyramid_tpu.match.position_encoding import VolPEConfig
from deformationpyramid_tpu.match.transformer import TransformerConfig

FD = 96


def test_write_3dmatch_suite_layout(tmp_path):
    info = write_3dmatch_suite(str(tmp_path), "3DMatch", n_pairs=3,
                               n_scene=600, seed=5)
    ds = ThreeDMatchDataset(info, str(tmp_path))
    assert len(ds) == 3
    for i in range(3):
        pair = ds[i]
        # rigid: flow_gt equals the SE(3) displacement exactly
        warped = pair.src @ pair.rot.T + pair.trans.reshape(3)
        np.testing.assert_allclose(pair.flow_gt, warped - pair.src,
                                   rtol=0, atol=1e-5)
        # fragments overlap: GT-aligned source has neighbors in tgt
        assert pair.overlap.sum() > 50
        # proper rotation
        np.testing.assert_allclose(pair.rot @ pair.rot.T, np.eye(3),
                                   atol=1e-5)
        assert np.linalg.det(pair.rot) > 0.99


def test_write_3dmatch_train_suite_regime(tmp_path):
    """The eval-regime training writer: 4DMatch layout, exact GT convention
    on the overlap correspondences, arbitrary-axis rotations in the eval
    suite's 0.1-0.6 rad range (vs train-3dm's z-only <=0.2)."""
    from deformationpyramid_tpu.data.fourdmatch import FourDMatchDataset
    from deformationpyramid_tpu.data.synthetic import write_3dmatch_train_suite

    paths = write_3dmatch_train_suite(str(tmp_path), "train-3dm-b",
                                      n_pairs=4, n_scene=600, noise=0.002,
                                      seed=9)
    assert len(paths) == 4
    ds = FourDMatchDataset(str(tmp_path), "train-3dm-b")
    assert len(ds) == 4
    angles, off_z = [], []
    for i in range(4):
        with np.load(paths[i]) as z:
            corr = z["correspondences"]
            rot, trans = z["rot"], z["trans"]
            src, tgt, flow = z["s_pc"], z["t_pc"], z["s2t_flow"]
        assert flow.shape == src.shape and not flow.any()  # rigid
        # double-sided crops still overlap
        assert 50 < len(corr) < len(src)
        # GT convention R(Ps+flow)+t = Pt holds on the overlap up to the
        # 2 mm noise on both sides
        warped = src[corr[:, 0]] @ rot.T + trans.reshape(3)
        err = np.linalg.norm(warped - tgt[corr[:, 1]], axis=1)
        assert err.max() < 0.02, err.max()
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
        ang = np.arccos(np.clip((np.trace(rot) - 1) / 2, -1, 1))
        angles.append(ang)
        # arbitrary axis: rotation moves the z direction for generic draws
        off_z.append(abs(rot[2, 2] - 1.0))
    assert max(angles) > 0.25          # beyond train-3dm's 0.2 cap
    assert all(a <= 0.6 + 1e-6 for a in angles)
    assert max(off_z) > 1e-3           # not z-only


def test_eval_3dmatch_loop(tmp_path):
    from deformationpyramid_tpu.cli.eval_3dmatch import run_eval_3dmatch

    info = write_3dmatch_suite(str(tmp_path / "split"), "3DMatch",
                               n_pairs=2, n_scene=500, noise=0.001, seed=7)
    ds = ThreeDMatchDataset(info, str(tmp_path / "split"))
    gt_covs = ds.infos["gt_cov"]

    kcfg = KPConvConfig(first_subsampling_dl=0.05, first_feats_dim=32,
                        coarse_feature_dim=FD, fine_feature_dim=24)
    vol = VolPEConfig(feature_dim=FD, vol_origin=(-2.0, -2.0, -2.0))
    lcfg = LandmarkConfig(
        matcher=MatcherConfig(
            kpfcn=kcfg,
            transformer=TransformerConfig(feature_dim=FD, n_head=4, vol=vol,
                                          matching=MatchingConfig(feature_dim=FD)),
            matching=MatchingConfig(feature_dim=FD), max_matches=32),
        neco=NeCoConfig(feature_dim=48, n_head=4, num_layers=2),
        inlier_thr=0.0, reject_outliers=False)
    params = init_landmark_model(jax.random.key(0), lcfg)

    summary = run_eval_3dmatch(lcfg, params, ds, gt_covs,
                               log_dir=str(tmp_path / "log"),
                               ransac_iters=200, visualize=True)
    assert summary["metric"] == "threedmatch_recall"
    assert summary["pairs"] == 2
    assert 0.0 <= summary["value"] <= 1.0

    rows = [json.loads(ln) for ln in
            (tmp_path / "log" / "3DMatch.pairs.jsonl").read_text().splitlines()]
    assert len(rows) == 2
    for row in rows:
        for k in ("recall_ok", "trans_err", "IR", "RRE_deg", "RTE",
                  "n_matches", "ransac_inliers"):
            assert k in row, k
    # --visualize artifacts: one correspondence PNG + PLY per pair with
    # surviving matches
    n_with = sum(1 for row in rows if row["n_matches"] > 0)
    vis = tmp_path / "log" / "vis"
    assert len(list(vis.glob("*_corr.png"))) == n_with
    assert len(list(vis.glob("*_corr.ply"))) == n_with
