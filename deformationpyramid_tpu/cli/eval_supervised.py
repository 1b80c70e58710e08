"""LNDP supervised evaluation: learned landmarks guiding NDP registration.

TPU re-design of ``/root/reference/eval_supervised.py``: for each pair,
build the KPConv pyramid (host), run the Lepard matcher + NeCo outlier
rejection (device, jitted), hand the surviving landmark pairs to the
landmark-mode NDP solver, and score scene-flow metrics.

Usage:
  python -m deformationpyramid_tpu.cli.eval_supervised --config config/LNDP.yaml \
      [--weights snapshot/landmark.npz] [--limit N]

Without --weights, runs with random matcher/NeCo weights (pipeline
validation only — the reference ships pretrained checkpoints that are not
vendored in this tree; see match/port_torch.py to import torch weights).
"""
from __future__ import annotations

import argparse
import time
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data.collate import build_pair_pyramid, calibrate_neighborhood_limits
from ..data.fourdmatch import FourDMatchDataset
from ..match.backbone import KPFCN_ARCHITECTURE
from ..match.landmark import LandmarkConfig, init_landmark_model, landmark_inference
from ..metrics.flow import compute_flow_metrics
from ..models.pyramid import NDPConfig
from ..solve.registration import SolverConfig, register_pair
from ..utils.checkpoint import load_pytree
from ..utils.config import load_config
from ..utils.logging import AverageMeter, Logger, write_run_provenance
from ..utils.timers import Timers
from .eval_nolearned import _fused_iter_default, _metric_device


# NOTE on shape buckets: shape diversity is the whole cost model here —
# every distinct padded shape tuple compiles the 37M-param matcher (~70 s)
# and the solver (~25 s) once. The sweep buckets to POWERS OF TWO inside
# ``collate_one`` (finer quarter-octave buckets made nearly every pair a
# unique compile: 12 pairs took 24 min, ~95% compiles).


def make_flow_interp(pair):
    """Deformation-only flow interpolator for a pair: kNN-IDW blend of the
    per-point flow (the IR definition wants R(Ps+flow)+t vs ldmk_t;
    flow_gt stores the composed motion, so invert the rigid part). Returns
    a callable reusable across query sets — the anchor cKDTree is built
    ONCE per pair (the harvest queries it for both the filtered landmarks
    and the raw pre-NeCo matches)."""
    from ..data.correspondence_utils import SceneFlowInterp

    # flow_def = R^-1 (flow_gt + Ps - t) - Ps
    flow_def = (pair.rot.T @ (pair.flow_gt + pair.src
                              - pair.trans.T).T).T - pair.src
    return SceneFlowInterp(pair.src, flow_def.astype(np.float32))


def interp_flow(query_pts: np.ndarray, pair) -> np.ndarray:
    """One-shot ``make_flow_interp`` (kept for external probes/harnesses)."""
    return make_flow_interp(pair)(query_pts)


def run_eval(cfg, lcfg: LandmarkConfig, params, scfg: SolverConfig,
             splits, batch_limit=None, seed=0, log_dir="snapshot/lndp",
             stream_depth: int = 4, resume: bool = False,
             stage_timers: bool = False, oracle_filter: bool = False,
             visualize: bool = False):
    import json

    timers = Timers()
    key = jax.random.key(seed)
    write_run_provenance(log_dir)

    # static per-cloud coarse caps (bucketed) halve each side of the [S, T]
    # transformer/matching/procrustes objects vs padding both to the full
    # stacked coarse size; one compile per (s_cap, t_cap) bucket pair
    ldmk_jit = jax.jit(
        lambda p, pyr, sl, tl, s_cap, t_cap: landmark_inference(
            p, pyr, sl, tl, lcfg, s_cap=s_cap, t_cap=t_cap),
        static_argnums=(4, 5))
    # split matcher / NeCo programs for the instrumented + oracle modes
    # (--stage-timers syncs between stages; --oracle-filter needs the raw
    # match set on the host before the solver sees landmarks)
    split_stages = stage_timers or oracle_filter
    if split_stages:
        from ..match.landmark import matcher_inference, neco_filter

        match_jit = jax.jit(
            lambda p, pyr, sl, tl, s_cap, t_cap: matcher_inference(
                p, pyr, sl, tl, lcfg, s_cap=s_cap, t_cap=t_cap),
            static_argnums=(4, 5))
        neco_jit = jax.jit(lambda p, d: neco_filter(p, d, lcfg))
    # tunnel round-trip probe: fetching a READY 0-d buffer measures pure
    # link latency at that moment (no compute, no compile), so stage wall
    # times can be read against concurrent congestion (VERDICT r4 #5)
    _probe = jnp.zeros(())
    np.asarray(_probe)  # warm the fetch path

    def _rtt_ms() -> float:
        t0 = time.perf_counter()
        np.asarray(_probe)
        return (time.perf_counter() - t0) * 1e3

    from .eval_nolearned import METRIC_KEYS

    def _reg_metrics(k, s, t, sv, tv, fg, ov, ls, lt, lv):
        """Solve + flow metrics in ONE program: only a [12] metric vector
        crosses the tunnel back (fetching the warped [N, 3] cloud per pair
        was the sweep's serial cost under tunnel congestion)."""
        warped, _ = register_pair(k, s, t, scfg, src_valid=sv, tgt_valid=tv,
                                  src_ldmk=ls, tgt_ldmk=lt, ldmk_valid=lv)
        m = compute_flow_metrics(warped - s, fg, overlap=ov, valid=sv)
        return jnp.stack([m[k2] for k2 in METRIC_KEYS])

    reg_jit = jax.jit(_reg_metrics)

    # jitted host-side matcher metrics (CPU device at call time via
    # jax.default_device in harvest): inputs are shape-bucketed, so these
    # compile a handful of times and then run sub-ms vs ~46 ms/pair eager
    from ..metrics.matching import inlier_ratio, nrfmr

    ir_jit = jax.jit(inlier_ratio)
    nrfmr_jit = jax.jit(lambda ls, lt, lv, mp, mf, mv: nrfmr(
        ls, lt, lv, mp, mf, metric_valid=mv))

    for split in splits:
        ds = FourDMatchDataset(cfg.data_root, split)
        if len(ds) == 0:
            print(f"[skip] no data for split {split} under {cfg.data_root}")
            continue
        if batch_limit is not None:
            ds.entries = ds.entries[:batch_limit]
        n_total = len(ds)
        logger = Logger(os.path.join(log_dir, split + ".log"))
        meters: dict[str, AverageMeter] = {}
        n_done = 0
        stamps: list[float] = []   # harvest times -> per-pair summary
        stages_acc: dict[str, list[float]] = {}  # --stage-timers ms lists

        # lossless eval-sweep resume, same .done + .pairs.jsonl ledger
        # protocol as eval_nolearned (reference equivalent: per-split
        # snapshot logs, eval_supervised.py:66) — finished pairs are
        # skipped AND their metric contributions recovered into the meters
        done_path = os.path.join(log_dir, split + ".done")
        ledger_path = os.path.join(log_dir, split + ".pairs.jsonl")
        if resume and os.path.exists(done_path):
            with open(done_path) as f:
                finished = set(f.read().split())
            before = len(ds.entries)
            ds.entries = [e for e in ds.entries if e not in finished]
            print(f"[resume] {before - len(ds.entries)} pairs already done")
            if os.path.exists(ledger_path):
                recovered = set()
                for line in open(ledger_path):
                    row = json.loads(line)
                    name = row.pop("name", None)
                    if name in finished and name not in recovered:
                        recovered.add(name)
                        for k2, v in row.items():
                            if isinstance(v, (int, float)):
                                meters.setdefault(
                                    k2, AverageMeter()).update(v)
                n_done = len(recovered)
        done_fw = open(done_path, "a")
        ledger_fw = open(ledger_path, "a")

        # calibrate neighborhood limits on a few pairs (dataloader.py:609)
        sample_pairs = [(ds[i].src, ds[i].tgt) for i in range(min(3, len(ds)))]
        limits = calibrate_neighborhood_limits(sample_pairs, lcfg.matcher.kpfcn,
                                               KPFCN_ARCHITECTURE)

        def collate_one(i):
            pair = ds[i]
            # POWER-OF-TWO pad per level (pad_to="pow2"): each distinct
            # padded shape tuple costs a fresh ~70-100 s matcher compile,
            # which dominates any sweep under ~1000 pairs; doubling buckets
            # collapse a 1.5k-30k-point suite to ~5 signatures. Computed
            # inside the builder — ONE native collate pass, not the former
            # build-to-measure-then-rebuild two (collate was half the LNDP
            # path's per-pair host cost, VERDICT r4 weak #1).
            pyr = build_pair_pyramid(pair.src, pair.tgt, lcfg.matcher.kpfcn,
                                     KPFCN_ARCHITECTURE, limits,
                                     pad_to="pow2")
            return pair, pyr

        # one-pair lookahead: the numpy/C++ collate of pair i+1 overlaps the
        # device's matcher+solver on pair i (the two are comparable cost —
        # ~0.36 s collate vs ~0.32 s matcher at 8k points)
        from concurrent.futures import ThreadPoolExecutor

        def gt_inlier_keep(v6: np.ndarray, mask: np.ndarray,
                           pair) -> np.ndarray:
            """GT inlier mask over raw matches (reference
            ``outlier_rejection/loss.py:162-190`` compute_inlier_mask):
            inlier iff ||R(s + flow_def(s)) + t - t_match|| < 0.04."""
            flow = interp_flow(np.ascontiguousarray(v6[:, :3]), pair)
            warped = (pair.rot @ (v6[:, :3] + flow).T + pair.trans).T
            d2 = np.sum((warped - v6[:, 3:]) ** 2, axis=1)
            return mask & (d2 < 0.04 ** 2)

        def dispatch(pair, pyr):
            """Enqueue matcher + landmark-guided solve for one pair;
            returns device futures (no host sync on the default path;
            --stage-timers/--oracle-filter sync between stages)."""
            nonlocal key
            stage: dict[str, float] = {}
            pyrd = {"points": [jnp.array(p) for p in pyr.points],
                    "valids": [jnp.array(v) for v in pyr.valids],
                    "neighbors": [jnp.array(x) for x in pyr.neighbors],
                    "pools": [jnp.array(x) for x in pyr.pools],
                    "upsamples": [jnp.array(x) for x in pyr.upsamples],
                    "features": jnp.array(pyr.features)}
            cl = lcfg.matcher.coarse_level
            # symmetric power-of-two cap: still ~2x less [S, T] work than
            # padding to the full stacked size, but only O(log) distinct
            # compiled signatures per sweep (each new matcher signature
            # costs a ~70 s compile; quarter-octave per-side caps made
            # nearly every pair a fresh signature on small sweeps)
            cap = 512
            while cap < max(int(pyr.src_lengths[cl]),
                            int(pyr.tgt_lengths[cl])):
                cap *= 2
            sl = jnp.int32(pyr.src_lengths[cl])
            tl = jnp.int32(pyr.tgt_lengths[cl])
            if split_stages:
                if stage_timers:
                    stage["rtt_pre"] = _rtt_ms()
                t0 = time.perf_counter()
                data = match_jit(params, pyrd, sl, tl, cap, cap)
                if stage_timers:
                    np.asarray(data["vec_6d"])
                    stage["matcher"] = (time.perf_counter() - t0) * 1e3
                if oracle_filter:
                    t0 = time.perf_counter()
                    v6 = np.asarray(data["vec_6d"])
                    mask = np.asarray(data["vec_6d_mask"]).astype(bool)
                    keep = gt_inlier_keep(v6, mask, pair)
                    vec6d = np.where(keep[:, None], v6, 0.0).astype(np.float32)
                    data = dict(data,
                                neco_confidence=jnp.array(
                                    keep.astype(np.float32)),
                                ldmk_s=jnp.array(vec6d[:, :3]),
                                ldmk_t=jnp.array(vec6d[:, 3:]),
                                ldmk_valid=jnp.array(keep))
                    if stage_timers:
                        stage["oracle"] = (time.perf_counter() - t0) * 1e3
                else:
                    t0 = time.perf_counter()
                    data = neco_jit(params, data)
                    if stage_timers:
                        np.asarray(data["ldmk_valid"])
                        stage["neco"] = (time.perf_counter() - t0) * 1e3
            else:
                data = ldmk_jit(params, pyrd, sl, tl, cap, cap)
            key, sub = jax.random.split(key)
            # bucket-pad the solver inputs too: register_pair compiles per
            # (n_src, n_tgt) shape (~25 s each), so raw per-pair shapes mean
            # a fresh solver compile for nearly every pair
            ns, nt = len(pair.src), len(pair.tgt)
            # power-of-two here too: the solver recompiles per (n_src,
            # n_tgt) shape (~25 s) and its per-iteration cost is nearly
            # size-independent (chamfer runs on the fixed 2000-sample set)
            nb = mb = 1024
            while nb < ns:
                nb *= 2
            while mb < nt:
                mb *= 2
            src_p = np.zeros((nb, 3), np.float32)
            src_p[:ns] = pair.src
            tgt_p = np.zeros((mb, 3), np.float32)
            tgt_p[:nt] = pair.tgt
            sv = np.zeros(nb, bool)
            sv[:ns] = True
            tv = np.zeros(mb, bool)
            tv[:nt] = True
            fg_p = np.zeros((nb, 3), np.float32)
            fg_p[:ns] = pair.flow_gt
            ov_p = np.zeros(nb, bool)
            ov_p[:ns] = pair.overlap
            t0 = time.perf_counter()
            mvec = reg_jit(sub, jnp.array(src_p), jnp.array(tgt_p),
                           jnp.array(sv), jnp.array(tv),
                           jnp.array(fg_p), jnp.array(ov_p),
                           data["ldmk_s"], data["ldmk_t"],
                           data["ldmk_valid"])
            if stage_timers:
                np.asarray(mvec)
                stage["solve"] = (time.perf_counter() - t0) * 1e3
                stage["rtt_post"] = _rtt_ms()
            return pair, data, mvec, stage

        def harvest(item):
            pair, data, mvec, stage = item
            t_h = time.perf_counter()
            # flow metrics arrive as ONE small device vector; matcher-side
            # metrics (IR/NRFMR) need only the [K,3] landmark arrays — the
            # host math runs on the local CPU backend (eager jnp ops on the
            # tunneled TPU are remote dispatches, seconds each)
            m = dict(zip(METRIC_KEYS, (float(v) for v in np.asarray(mvec))))
            ldmk_s = np.asarray(data["ldmk_s"])
            ldmk_t = np.asarray(data["ldmk_t"])
            ldmk_valid = np.asarray(data["ldmk_valid"])
            interp = make_flow_interp(pair)  # one cKDTree, two query sets
            ldmk_flow_gt = interp(ldmk_s)
            with jax.default_device(_metric_device()):
                m["n_landmarks"] = float(ldmk_valid.sum())
                # matcher-side metrics: IR @0.04m on the landmark pairs;
                # NRFMR over the metric-index sample (4DLoMatch) or overlap.
                # ir_jit/nrfmr_jit: landmark/match arrays arrive pow2-
                # bucketed and the metric sample is bucket-padded below, so
                # each compiles once per bucket (eager was ~46 ms/pair).
                m["IR"] = float(ir_jit(
                    ldmk_s, ldmk_t, ldmk_valid, pair.rot, pair.trans,
                    ldmk_flow_gt))
                # pre-NeCo IR over the RAW mutual-max match set (reference
                # outlier_rejection/loss.py:30-60 reports IR before/after
                # filtering) — with rejection on, IR - IR_pre is NeCo's
                # per-pair effect without needing an on/off A/B run
                v6 = np.asarray(data["vec_6d"])
                v6_mask = np.asarray(data["vec_6d_mask"])
                m["n_matches_pre"] = float(v6_mask.sum())
                m["IR_pre"] = float(ir_jit(
                    np.ascontiguousarray(v6[:, :3]),
                    np.ascontiguousarray(v6[:, 3:]), v6_mask,
                    pair.rot, pair.trans,
                    interp(np.ascontiguousarray(v6[:, :3]))))
                if pair.metric_index is not None and len(pair.metric_index):
                    mi = pair.metric_index
                else:
                    mi = np.nonzero(pair.overlap)[0][:1000]
                if len(mi):
                    cap = 1
                    while cap < len(mi):
                        cap *= 2
                    mpts = np.zeros((cap, 3), np.float32)
                    mflow = np.zeros((cap, 3), np.float32)
                    mpts[: len(mi)] = pair.src[mi]
                    mflow[: len(mi)] = pair.flow_gt[mi]
                    mvalid = np.zeros(cap, bool)
                    mvalid[: len(mi)] = True
                    m["NRFMR"] = float(nrfmr_jit(
                        ldmk_s, ldmk_t, ldmk_valid, mpts, mflow, mvalid))
            if visualize and ldmk_valid.any():
                # correspondence-line render, NeCo-confidence colored PNG +
                # GT-inlier colored edge PLY (reference debugging parity:
                # utils/vis.py correspondence toggles)
                from ..utils.vis import (export_correspondences_ply,
                                         visualize_correspondences)

                vdir = os.path.join(log_dir, "vis")
                os.makedirs(vdir, exist_ok=True)
                sel = ldmk_valid.astype(bool)
                conf = np.asarray(data["neco_confidence"])[sel]
                warped = ((pair.rot @ (ldmk_s[sel] + ldmk_flow_gt[sel]).T).T
                          + pair.trans.reshape(3))
                inl = np.linalg.norm(warped - ldmk_t[sel], axis=1) < 0.04
                base = pair.name.replace("/", "_")
                visualize_correspondences(
                    ldmk_s[sel], ldmk_t[sel], confidence=conf,
                    src_pcd=pair.src, tgt_pcd=pair.tgt,
                    save_path=os.path.join(vdir, base + "_corr.png"))
                export_correspondences_ply(
                    os.path.join(vdir, base + "_corr.ply"),
                    ldmk_s[sel], ldmk_t[sel], inlier=inl)
            nonlocal n_done
            row = {k2: float(v) for k2, v in m.items()}
            for k2, v in row.items():
                meters.setdefault(k2, AverageMeter()).update(v)
            n_done += 1
            extra = {}
            if stage:
                stage["metrics"] = (time.perf_counter() - t_h) * 1e3
                for k2, v in stage.items():
                    stages_acc.setdefault(k2, []).append(v)
                extra["stages_ms"] = {k2: round(v, 2)
                                      for k2, v in stage.items()}
            ledger_fw.write(json.dumps(dict(row, name=pair.name, **extra))
                            + "\n")
            ledger_fw.flush()
            done_fw.write(pair.name + "\n")
            done_fw.flush()
            stamps.append(time.perf_counter())

        # pipelined sweep: collate runs one pair ahead in a worker thread,
        # matcher+solver dispatches run ``stream_depth`` pairs ahead of the
        # host-side harvest (metrics + ledger) — no sync between the
        # matcher and the solver of a pair, none between pairs
        pool = ThreadPoolExecutor(1)
        fut = pool.submit(collate_one, 0) if len(ds) else None
        pending: list = []
        t_split = time.perf_counter()
        stamps.append(t_split)
        for i in range(len(ds)):
            timers.tic("collate")
            pair, pyr = fut.result()
            if i + 1 < len(ds):
                fut = pool.submit(collate_one, i + 1)
            timers.toc("collate")
            timers.tic("dispatch")
            pending.append(dispatch(pair, pyr))
            timers.toc("dispatch")
            if len(pending) > stream_depth:
                harvest(pending.pop(0))
        while pending:
            harvest(pending.pop(0))
        dt = time.perf_counter() - t_split
        if len(ds):
            print(f"[{split}] {len(ds)} pairs in {dt:.1f}s "
                  f"= {len(ds) / dt:.2f} pairs/s")
            from ..utils.reporting import split_summary

            summary = split_summary("lndp_suite", split, stamps,
                                    len(ds), dt, stages_ms=stages_acc)
            print(summary)
            logger.write(summary + "\n")
        pool.shutdown(wait=False)
        msg = f"{n_done}/{n_total} pairs: " + "\t".join(
            f"{k}: {v.avg:.3f}" for k, v in meters.items())
        logger.write(msg + "\n")
        print("score on", split, "\n", msg)

    print("time cost average")
    for line in timers.get_strings():
        print(line)


def main():
    from ..utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--weights", default=None,
                    help="npz checkpoint of the landmark model")
    ap.add_argument("--splits", nargs="*", default=["4DMatch-F", "4DLoMatch-F"])
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--depth", type=int, default=4,
                    help="in-flight dispatch window (0 = synchronous)")
    ap.add_argument("--resume", action="store_true",
                    help="skip pairs already recorded in the split's .done "
                         "ledger and recover their metric contributions")
    ap.add_argument("--log-dir", default="snapshot/lndp",
                    help="snapshot directory for logs/ledgers (keep "
                         "before/after weight comparisons separate)")
    ap.add_argument("--max-matches", type=int, default=None,
                    help="override the extraction capacity (0/unset = "
                         "uncapped reference semantics; e.g. 256 restores "
                         "the pre-round-4 fixed top-k cap for A/Bs)")
    ap.add_argument("--w-cd", type=float, default=None,
                    help="override the chamfer weight in the landmark-mode "
                         "solver objective (reference registration.py:187-203: "
                         "loss_ldmk + w_cd * truncated-CD; config/LNDP.yaml "
                         "ships w_cd=0 = landmarks only)")
    ap.add_argument("--reject-outliers", dest="reject_outliers",
                    action="store_true", default=None,
                    help="force NeCo outlier rejection ON (A/B knob)")
    ap.add_argument("--no-reject-outliers", dest="reject_outliers",
                    action="store_false",
                    help="force NeCo outlier rejection OFF (A/B knob)")
    ap.add_argument("--inlier-thr", type=float, default=None,
                    help="override the NeCo confidence threshold "
                         "(reference configs/outlier_rejection.yaml / "
                         "landmark_estimator.py:63-72 inlier_thr, shipped "
                         "0.3; sweep knob for the filter operating point)")
    ap.add_argument("--oracle-filter", action="store_true",
                    help="replace NeCo with the GT inlier filter "
                         "(outlier_rejection/loss.py:162-190 mask at 4 cm): "
                         "the outlier-rejection CEILING — the gap between "
                         "this and the NeCo run is NeCo's remaining "
                         "headroom; the gap between this and zero error is "
                         "coverage-bound (diagnostic only, uses GT)")
    ap.add_argument("--visualize", action="store_true",
                    help="save per-pair correspondence-line renders "
                         "(NeCo-confidence PNG + GT-inlier edge PLY) under "
                         "<log-dir>/vis/ (reference utils/vis.py "
                         "correspondence viewer, headless)")
    ap.add_argument("--stage-timers", action="store_true",
                    help="instrumented mode: sync between matcher / NeCo / "
                         "solver stages and record per-pair device-visible "
                         "ms per stage plus tunnel round-trip probes "
                         "(attributes wall cost; slower than the pipelined "
                         "default — do not use for throughput artifacts)")
    args = ap.parse_args()

    cfg = load_config(args.config)
    reject = (args.reject_outliers if args.reject_outliers is not None
              else cfg.get("reject_outliers", True))
    if args.oracle_filter:
        reject = False   # NeCo never runs; the GT filter replaces it
    inlier_thr = (args.inlier_thr if args.inlier_thr is not None
                  else cfg.get("inlier_thr", 0.3))
    max_matches = (args.max_matches if args.max_matches is not None
                   else cfg.get("max_matches")) or None
    ldmk_yaml = cfg.get("ldmk_config")
    if ldmk_yaml and os.path.exists(ldmk_yaml):
        from ..match.config_loader import landmark_config_from_yaml

        lcfg = landmark_config_from_yaml(
            ldmk_yaml, inlier_thr=inlier_thr,
            reject_outliers=reject,
            # default None = uncapped extraction (capacity follows the
            # coarse bucket); `max_matches: 256` restores the cap
            max_matches=max_matches)
    else:
        lcfg = LandmarkConfig(inlier_thr=inlier_thr,
                              reject_outliers=reject)
    scfg = SolverConfig(
        pyramid=NDPConfig(m=cfg.get("m", 10), k0=cfg.get("k0", -8),
                          depth=cfg.get("depth", 3), width=cfg.get("width", 128),
                          rotation_format=cfg.get("rotation_format", "axis_angle"),
                          motion=cfg.get("motion_type", "SE3")),
        iters=cfg.get("iters", 500), lr=cfg.get("lr", 0.01),
        samples=cfg.get("samples", 2000),
        w_cd=(args.w_cd if args.w_cd is not None else cfg.get("w_cd", 0.0)),
        trunc_cd=cfg.get("trunc_cd", 0.25),
        use_fused_iteration=_fused_iter_default(cfg))

    params = init_landmark_model(jax.random.key(0), lcfg)
    if args.weights:
        params = load_pytree(args.weights, params)
    else:
        print("[warn] no --weights: running with random landmark-model "
              "weights (pipeline validation only)")

    run_eval(cfg, lcfg, params, scfg, args.splits, args.limit,
             stream_depth=args.depth, resume=args.resume,
             log_dir=args.log_dir, stage_timers=args.stage_timers,
             oracle_filter=args.oracle_filter, visualize=args.visualize)


if __name__ == "__main__":
    main()
