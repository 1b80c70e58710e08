"""LNDP eval-path benchmark: supervised suite throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} —
the LNDP counterpart of bench.py (VERDICT r4 weak #1: the learned eval
path never had a BENCH-style tracked artifact, so BENCH_r*.json could
never see an LNDP regression).

Workload: `eval_supervised.run_eval` over the fabricated 4DMatch-F suite
(scripts/make_suites.py, byte-stable), trained weights when present
(snapshot/landmark_trained.npz — weights provenance is recorded in the
line; random weights produce ~0 landmarks and a different solve profile,
so the line is only comparable at equal `weights`). Reference equivalent:
the strictly sequential matcher->NDP loop in
``/root/reference/eval_supervised.py:88-187`` (no published pairs/s).

Baseline for vs_baseline: the round-4 e2e artifact — median 889 s /
100 pairs = 0.1125 pairs/s (snapshot/onchip_r4/lndp_full_rep{2,3},
docs/LEARNING.md).
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile

BASELINE_PAIRS_PER_SEC = 100.0 / 889.0  # round-4 lndp_full median artifact


def one_rep(cfg, lcfg, params, scfg, split: str, limit: int | None) -> dict:
    from deformationpyramid_tpu.cli.eval_supervised import run_eval

    with tempfile.TemporaryDirectory() as td:
        run_eval(cfg, lcfg, params, scfg, [split], batch_limit=limit,
                 log_dir=td)
        log = open(os.path.join(td, f"{split}.log")).read().splitlines()
    summary = next(json.loads(l) for l in log
                   if l.startswith("{") and '"lndp_suite"' in l)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", default="4DMatch-F")
    ap.add_argument("--limit", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--weights", default="snapshot/landmark_trained.npz")
    args = ap.parse_args()

    from deformationpyramid_tpu.utils.compilation_cache import enable
    enable()

    import jax

    from deformationpyramid_tpu.cli.eval_supervised import (
        LandmarkConfig, NDPConfig, SolverConfig, init_landmark_model,
        load_config, load_pytree,
    )

    cfg = load_config("config/LNDP.yaml")
    from deformationpyramid_tpu.match.config_loader import landmark_config_from_yaml

    lcfg = landmark_config_from_yaml(
        cfg["ldmk_config"], inlier_thr=cfg.get("inlier_thr", 0.3),
        reject_outliers=cfg.get("reject_outliers", True), max_matches=None)
    scfg = SolverConfig(
        pyramid=NDPConfig(m=cfg.get("m", 10), k0=cfg.get("k0", -8),
                          depth=cfg.get("depth", 3),
                          width=cfg.get("width", 128),
                          rotation_format=cfg.get("rotation_format",
                                                  "axis_angle"),
                          motion=cfg.get("motion", "SE3")),
        iters=cfg.get("iters", 500), lr=cfg.get("lr", 0.01),
        max_break_count=cfg.get("max_break_count", 15),
        break_threshold_ratio=cfg.get("break_threshold_ratio", 0.001),
        samples=cfg.get("samples", 2000), w_ldmk=cfg.get("w_ldmk", 1.0),
        w_cd=cfg.get("w_cd", 0.0))
    params = init_landmark_model(jax.random.key(0), lcfg)
    have_weights = os.path.exists(args.weights)
    if have_weights:
        params = load_pytree(args.weights, params)

    reps = [one_rep(cfg, lcfg, params, scfg, args.split, args.limit)
            for _ in range(args.reps)]
    reps.sort(key=lambda s: s["pairs_per_sec"])
    med = reps[len(reps) // 2]
    best_per_pair = min(s["per_pair_s"]["best"] for s in reps
                        if s.get("per_pair_s"))
    print(json.dumps({
        "metric": "lndp_pairs_per_sec",
        "value": med["pairs_per_sec"],
        "unit": "pairs/s",
        "vs_baseline": round(med["pairs_per_sec"] / BASELINE_PAIRS_PER_SEC, 2),
        "per_pair_best_s": best_per_pair,
        "pairs": med["pairs"],
        "split": args.split,
        "weights": args.weights if have_weights else "random",
        "reps": args.reps,
    }))


if __name__ == "__main__":
    main()
