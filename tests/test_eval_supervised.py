"""End-to-end test of the LNDP supervised eval loop (small dims, CPU)."""
import numpy as np
import pytest

import jax

from deformationpyramid_tpu.match.kpconv import KPConvConfig
from deformationpyramid_tpu.match.landmark import LandmarkConfig, init_landmark_model
from deformationpyramid_tpu.match.matching import MatchingConfig
from deformationpyramid_tpu.match.outlier_rejection import NeCoConfig
from deformationpyramid_tpu.match.pipeline import MatcherConfig
from deformationpyramid_tpu.match.position_encoding import VolPEConfig
from deformationpyramid_tpu.match.transformer import TransformerConfig
from deformationpyramid_tpu.models.pyramid import NDPConfig
from deformationpyramid_tpu.solve.registration import SolverConfig
from deformationpyramid_tpu.utils.config import AttrDict

FD = 96


def test_run_eval_supervised_loop(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_eval_cli import write_synthetic_4dmatch

    from deformationpyramid_tpu.cli.eval_supervised import run_eval

    root = str(tmp_path / "split")
    write_synthetic_4dmatch(root, "4DMatch-F", n_pairs=2, n_pts=250)

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
    scfg = SolverConfig(pyramid=NDPConfig(m=2, k0=-3, depth=2, width=16),
                        iters=10, samples=64, use_pallas=False)
    params = init_landmark_model(jax.random.key(0), lcfg)
    cfg = AttrDict({"data_root": root})

    run_eval(cfg, lcfg, params, scfg, ["4DMatch-F"],
             log_dir=str(tmp_path / "log"))
    # log file written with the metric line incl. IR/NRFMR keys
    log = (tmp_path / "log" / "4DMatch-F.log").read_text()
    assert "full-epe" in log
    assert "IR" in log and "NRFMR" in log

    # pre-NeCo IR recorded per pair; with rejection OFF the filter is the
    # identity so IR == IR_pre row by row
    import json
    rows = [json.loads(ln) for ln in
            (tmp_path / "log" / "4DMatch-F.pairs.jsonl").read_text().splitlines()]
    for row in rows:
        assert row["IR_pre"] == pytest.approx(row["IR"])
        assert row["n_matches_pre"] >= row["n_landmarks"]

    # lossless resume: the ledger recorded both pairs, so a resumed sweep
    # skips everything yet reproduces the aggregates in a fresh log line
    ledger = (tmp_path / "log" / "4DMatch-F.pairs.jsonl").read_text()
    assert len(ledger.splitlines()) == 2
    run_eval(cfg, lcfg, params, scfg, ["4DMatch-F"],
             log_dir=str(tmp_path / "log"), resume=True)
    all_lines = (tmp_path / "log" / "4DMatch-F.log").read_text().splitlines()
    # the sweep also logs one bench-style JSON summary line (utils/reporting)
    assert any(l.startswith("{") and '"lndp_suite"' in l for l in all_lines)
    lines = [l for l in all_lines if "full-epe" in l and not l.startswith("{")]
    assert len(lines) == 2
    assert lines[0].split("pairs:")[1] == lines[1].split("pairs:")[1]
    # no pairs were re-evaluated
    assert len((tmp_path / "log" /
                "4DMatch-F.pairs.jsonl").read_text().splitlines()) == 2

    # --stage-timers instrumented mode: per-pair per-stage ms in the ledger
    # and a stages_ms block in the suite summary JSON (VERDICT r4 #2/#5)
    run_eval(cfg, lcfg, params, scfg, ["4DMatch-F"],
             log_dir=str(tmp_path / "log_st"), stage_timers=True)
    rows = [json.loads(ln) for ln in
            (tmp_path / "log_st" /
             "4DMatch-F.pairs.jsonl").read_text().splitlines()]
    for row in rows:
        for k in ("matcher", "neco", "solve", "metrics",
                  "rtt_pre", "rtt_post"):
            assert k in row["stages_ms"], k
    summary = next(json.loads(l) for l in
                   (tmp_path / "log_st" / "4DMatch-F.log")
                   .read_text().splitlines() if l.startswith("{"))
    assert "matcher" in summary["stages_ms"]
    assert summary["stages_ms"]["solve"]["n"] == 2

    # --oracle-filter: GT-inlier filtering replaces NeCo; with the GT
    # filter the surviving landmark set is all-inlier, so IR == 1 whenever
    # any landmark survives (or the set is empty on random weights)
    # (+ --visualize: one correspondence PNG + edge PLY per pair)
    run_eval(cfg, lcfg, params, scfg, ["4DMatch-F"],
             log_dir=str(tmp_path / "log_or"), oracle_filter=True,
             visualize=True)
    rows = [json.loads(ln) for ln in
            (tmp_path / "log_or" /
             "4DMatch-F.pairs.jsonl").read_text().splitlines()]
    for row in rows:
        assert row["n_landmarks"] <= row["n_matches_pre"]
        if row["n_landmarks"] > 0:
            assert row["IR"] == pytest.approx(1.0)
    n_with_ldmk = sum(1 for row in rows if row["n_landmarks"] > 0)
    vis = tmp_path / "log_or" / "vis"
    assert len(list(vis.glob("*_corr.png"))) == n_with_ldmk
    assert len(list(vis.glob("*_corr.ply"))) == n_with_ldmk


