"""NDP & baseline evaluation on 4DMatch-F / 4DLoMatch-F.

TPU re-design of the reference benchmark driver
(``/root/reference/eval_nolearned.py``): instead of solving pairs strictly
sequentially with a host sync per Adam iteration, pairs are grouped into
shape buckets, solved as vmapped mega-batches (one compiled program per
bucket shape), and metrics accumulate in running meters.

Usage:
  python -m deformationpyramid_tpu.cli.eval_nolearned --config config/NDP.yaml
  python -m deformationpyramid_tpu.cli.eval_nolearned --config config/NDP.yaml \
      --splits 4DMatch-F --batch 16 --limit 64
"""
from __future__ import annotations

import argparse
import json
import os
import time
import zlib

import numpy as np

import jax
import jax.numpy as jnp

from ..data.fourdmatch import BucketBatcher, FourDMatchDataset, _bucket_size
from ..metrics.flow import compute_flow_metrics
from ..models.pyramid import NDPConfig, warp
from ..solve.registration import SolverConfig, optimize_pyramid, register_batch
from ..solve.baselines import (
    NSFPSolverConfig, NerfiesSolverConfig, SinkhornSolverConfig,
    register_nsfp, register_nerfies, register_sinkhorn,
)
from ..utils.config import AttrDict, load_config
from ..utils.logging import AverageMeter, Logger, write_run_provenance
from ..utils.timers import Timers


def _fused_iter_default(cfg: AttrDict) -> bool | None:
    """Fused-iteration solver kernels for the eval sweep: YAML key >
    DP_FUSED_ITER env > auto (on when the backend is TPU). The
    per-config applicability gates (`supports_fused_iteration` /
    `supports_fused_iteration_ldmk`) still decide per solve — every
    reference NDP config (all motions/rotation formats, chamfer,
    landmark and nonrigidity objectives) is covered; depth<2 falls
    back to the unfused path."""
    if "use_fused_iteration" in cfg:
        return bool(cfg["use_fused_iteration"])
    env = os.environ.get("DP_FUSED_ITER")
    if env is not None:
        return bool(int(env))
    try:
        return jax.default_backend() == "tpu" or None
    except Exception:  # pragma: no cover
        return None


def _fused_iter_explicit(cfg: AttrDict) -> bool | None:
    """YAML key > DP_FUSED_ITER env, NO TPU auto-on. For solvers where
    the on-chip A/B showed the fused iteration LOSES inside a compiled
    loop (NSFP: 0.1652 fused vs 0.1494 unfused ms/iter,
    scripts/ab_nsfp_iteration.py 2026-08-18 — a plain MLP chain XLA
    already fuses well, unlike the NDP level iteration where the fused
    two-kernel path wins +17% at bench level)."""
    if "use_fused_iteration" in cfg:
        return bool(cfg["use_fused_iteration"])
    env = os.environ.get("DP_FUSED_ITER")
    if env is not None:
        return bool(int(env))
    return None


def solver_from_config(cfg: AttrDict):
    """Map a reference-format YAML config onto a solver + batched runner."""
    model = cfg.get("deformation_model", "NDP")
    if model == "NDP":
        scfg = SolverConfig(
            pyramid=NDPConfig(
                m=cfg.get("m", 9), k0=cfg.get("k0", -8),
                depth=cfg.get("depth", 3), width=cfg.get("width", 128),
                rotation_format=cfg.get("rotation_format", "axis_angle"),
                motion=cfg.get("motion_type", "SE3"),
                nonrigidity_est=cfg.get("w_reg", 0.0) > 0,
            ),
            iters=cfg.get("iters", 500), lr=cfg.get("lr", 0.01),
            max_break_count=cfg.get("max_break_count", 15),
            break_threshold_ratio=cfg.get("break_threshold_ratio", 0.001),
            samples=cfg.get("samples", 2000), w_reg=cfg.get("w_reg", 0.0),
            # chamfer-mode truncation override (--trunc-chamfer / YAML):
            # reference hardcodes 1e9 (model/registration.py:212); finite
            # values are the partial-overlap control for occluded suites
            trunc_chamfer=cfg.get("trunc_chamfer", 1e9),
            use_fused_iteration=_fused_iter_default(cfg),
        )
        fn = lambda keys, s, t, sv, tv: register_batch(keys, s, t, scfg, sv, tv)
        return scfg, jax.jit(fn), "full"
    if model == "NSFP":
        scfg = NSFPSolverConfig(
            iters=cfg.get("iters", 5000), lr=cfg.get("lr", 0.01),
            max_break_count=cfg.get("max_break_count", 70),
            break_threshold_ratio=cfg.get("break_threshold_ratio", 0.001),
            samples=cfg.get("samples", 2000),
            use_fused_iteration=_fused_iter_explicit(cfg))
        fn = jax.jit(jax.vmap(
            lambda k, s, t, sv, tv: register_nsfp(k, s, t, scfg, sv, tv)))
        return scfg, fn, "full"
    if model == "Nerfies":
        scfg = NerfiesSolverConfig(
            iters=cfg.get("iters", 5000), lr=cfg.get("lr", 0.01),
            max_break_count=cfg.get("max_break_count", 70),
            break_threshold_ratio=cfg.get("break_threshold_ratio", 0.001),
            samples=cfg.get("samples", 2000))
        fn = jax.jit(jax.vmap(
            lambda k, s, t, sv, tv: register_nerfies(k, s, t, scfg, sv, tv)))
        return scfg, fn, "full"
    if model == "Sinkhorn":
        scfg = SinkhornSolverConfig(
            blur=cfg.get("blur", 0.1), reach=cfg.get("reach", 1.0),
            n_steps=cfg.get("Nsteps", 11), lr=cfg.get("lr", 1.0),
            samples=cfg.get("samples", 2000))
        fn = jax.jit(jax.vmap(
            lambda k, s, t, sv, tv: register_sinkhorn(k, s, t, scfg, sv, tv)))
        return scfg, fn, "subset"
    raise KeyError(f"unknown deformation_model {model!r} "
                   "(ED requires the depth/graph eval path)")


METRIC_KEYS = ("full-epe", "full-AccS", "full-AccR", "full-outlier",
               "vis-epe", "vis-AccS", "vis-AccR", "vis-outlier",
               "occ-epe", "occ-AccS", "occ-AccR", "occ-outlier")


def make_fast_solver(model: str, scfg):
    """Fixed-shape solver + bucketed warp/metrics programs (the fast path).

    The reference's sweep (``/root/reference/eval_nolearned.py:59-159``)
    re-runs ``optimize_deformation_pyramid`` per pair; its per-iteration
    cost is size-independent because the loss runs on the fixed
    ``config.samples`` subset (``model/registration.py:156-159``). Keying
    the compiled program on the ORIGINAL cloud size therefore wastes both a
    multi-minute compile per bucket shape and big-bucket iteration work.
    Here the sweep pays instead:

    * ONE compiled solver program at the [samples, 3] shape shared by every
      pair (subsample + mean-centering happen host-side), returning the
      final pyramid params;
    * one cheap forward-only warp+metrics program per power-of-two bucket
      (the final full-cloud warp is a single pass,
      ``model/registration.py:253-259``), chained on-device off the solver
      output so only one packed metric vector crosses the tunnel back.

    Transfer protocol: the tunneled device pays a round trip per array, so
    inputs are PACKED — samples as one [2, samples, 4] block (xyz + valid),
    the warp/metric input as one [N, 7] block (src_c, flow_gt,
    overlap/valid code) — and the 12 metric scalars return as ONE [12]
    vector (fetching them individually cost ~12 RTTs/pair).

    NSFP and Nerfies share the exact optimize-then-apply shape (reference
    ``registration.py:470-540, 265-339``), so the same machinery drives
    them; Sinkhorn evaluates on the moved subset and keeps the legacy path.
    """
    if model == "NDP":
        def opt_fn(key, ss, sv, ts, tv):
            return optimize_pyramid(key, ss, sv, ts, tv, scfg)

        def full_warp(state, src_c):
            return warp(state[0], src_c, scfg.pyramid)[0]
    elif model == "NSFP":
        from ..models.baselines import nsfp_flow
        from ..solve.baselines import optimize_nsfp

        def opt_fn(key, ss, sv, ts, tv):
            return optimize_nsfp(key, ss, sv, ts, tv, scfg)

        def full_warp(state, src_c):
            return src_c + nsfp_flow(state[0], src_c, scfg.net)
    elif model == "Nerfies":
        import dataclasses as _dc

        from ..models.baselines import nerfies_warp
        from ..solve.baselines import optimize_nerfies

        def opt_fn(key, ss, sv, ts, tv):
            return optimize_nerfies(key, ss, sv, ts, tv, scfg)

        def full_warp(state, src_c):
            net = _dc.replace(scfg.net, max_iter=scfg.iters)
            last_it = jnp.maximum(state[1]["iters"] - 1, 0)
            return nerfies_warp(state[0], src_c, last_it, net)
    else:
        raise KeyError(f"no fast path for deformation_model {model!r}")

    base_key = jax.random.key(0)

    @jax.jit
    def solve_fixed(seed, st_packed):
        key = jax.random.fold_in(base_key, seed)
        s_sample, s_valid = st_packed[0, :, :3], st_packed[0, :, 3] > 0.5
        t_sample, t_valid = st_packed[1, :, :3], st_packed[1, :, 3] > 0.5
        return opt_fn(key, s_sample, s_valid, t_sample, t_valid)

    @jax.jit
    def warp_metrics(state, packed, delta_mean):
        src_c = packed[:, :3]
        flow_gt = packed[:, 3:6]
        code = packed[:, 6]            # -1 pad, 0 valid non-overlap, 1 overlap
        valid = code > -0.5
        overlap = code > 0.5
        warped = full_warp(state, src_c)
        flow = warped - src_c + delta_mean  # == (warped+tgt_mean) - src
        m = compute_flow_metrics(flow, flow_gt, overlap=overlap, valid=valid)
        return jnp.stack([m[k] for k in METRIC_KEYS])

    @jax.jit
    def warp_bucket(state, packed):
        return full_warp(state, packed[:, :3])

    return solve_fixed, warp_metrics, warp_bucket


def _prep_sample(pts: np.ndarray, mean: np.ndarray, k: int,
                 rng: np.random.Generator) -> np.ndarray:
    """Host-side random ``k``-subset of a centered cloud -> [k, 4] packed
    block (xyz, valid flag), zero-padded.

    Mirrors the reference's ``randperm[:samples]`` subsample
    (``model/registration.py:156-159``) at a FIXED output shape so the
    solver program compiles once for the whole sweep.
    """
    n = len(pts)
    take = min(k, n)
    out = np.zeros((k, 4), np.float32)
    idx = rng.permutation(n)[:take]
    out[:take, :3] = pts[idx] - mean
    out[:take, 3] = 1.0
    return out


def _metric_device():
    """Local CPU device for per-pair metric math (falls back to default)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


@jax.jit
def _metrics_jit(flow, flow_gt, overlap, valid):
    return compute_flow_metrics(flow, flow_gt, overlap=overlap, valid=valid)


@jax.jit
def _metrics_vec_jit(flow, flow_gt, overlap, valid):
    m = compute_flow_metrics(flow, flow_gt, overlap=overlap, valid=valid)
    return jnp.stack([m[k] for k in METRIC_KEYS])


def main():
    from ..utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--splits", nargs="*", default=["4DMatch-F", "4DLoMatch-F"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--limit", type=int, default=None,
                    help="evaluate only the first N pairs per split")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true",
                    help="skip pairs already recorded in the split's "
                         ".done file (eval-sweep resume, SURVEY.md §5)")
    ap.add_argument("--square-buckets", action="store_true", default=True,
                    help="pad src/tgt to the same bucket (fewer compiles)")
    ap.add_argument("--no-square-buckets", dest="square_buckets",
                    action="store_false")
    ap.add_argument("--stream", action="store_true",
                    help="B=1 async pipeline instead of synchronous "
                         "mega-batches (fastest on one chip)")
    ap.add_argument("--depth", type=int, default=16,
                    help="in-flight program window for --stream")
    ap.add_argument("--visualize", action="store_true",
                    help="save a src/tgt/warped render per pair under the "
                         "snapshot dir (headless PNG; reference "
                         "eval_nolearned.py:31,149 shows a mayavi window)")
    ap.add_argument("--no-fast", dest="fast", action="store_false",
                    help="disable the fixed-shape fast path (one compiled "
                         "solver program + bucketed warp/metrics; "
                         "NDP/NSFP/Nerfies) and use legacy per-bucket "
                         "solver programs")
    ap.add_argument("--log-dir", default=None,
                    help="override the snapshot directory (default "
                         "snapshot/<folder>/<exp_dir> from the config)")
    ap.add_argument("--trunc-chamfer", type=float, default=None,
                    help="override the pure-chamfer-mode truncation "
                         "(reference default 1e9, model/registration.py:212); "
                         "e.g. 0.25 = the LNDP trunc_cd, the mechanism "
                         "designed for partial overlap — the no-learned "
                         "control for occlusion suites")
    ap.add_argument("--host-metrics", action="store_true",
                    help="fetch only the ~150 KB pyramid params per pair "
                         "and run the full-cloud warp + metrics on the "
                         "host (numpy) — ~5x fewer tunnel bytes than the "
                         "on-device warp/metrics program; use when the "
                         "shared link is congested (NDP fast path only)")
    args = ap.parse_args()

    cfg = load_config(args.config)
    if args.trunc_chamfer is not None:
        cfg["trunc_chamfer"] = args.trunc_chamfer
    if cfg.get("deformation_model") == "ED":
        # The reference drives all five deformation models through one entry
        # point (``/root/reference/eval_nolearned.py`` ->
        # ``model/registration.py:106-123`` dispatch); ED needs the
        # depth/graph path, which lives in eval_ed here — delegate.
        import sys
        from . import eval_ed
        print("[eval_nolearned] ED config -> delegating to cli.eval_ed")
        argv = ["eval_ed", "--config", args.config, "--splits", *args.splits]
        if args.limit is not None:
            argv += ["--limit", str(args.limit)]
        sys.argv = argv
        return eval_ed.main()

    # multi-host eval sweep over DCN (SURVEY.md §2.4): when a coordinator is
    # configured each process takes a strided shard of the pair list
    from ..parallel.mesh import initialize_distributed

    multi_host = initialize_distributed()

    snap_dir = args.log_dir or os.path.join(
        "snapshot", str(cfg.get("folder", "eval")),
        str(cfg.get("exp_dir", "run")))
    os.makedirs(snap_dir, exist_ok=True)
    write_run_provenance(snap_dir, args.config)

    scfg, run_batch, flow_scope = solver_from_config(cfg)
    timers = Timers()
    key = jax.random.key(args.seed)
    model = cfg.get("deformation_model", "NDP")
    use_fast = args.fast and model in ("NDP", "NSFP", "Nerfies")
    host_metrics = False
    if use_fast:
        solve_fixed, warp_metrics, warp_bucket = make_fast_solver(model, scfg)
        host_metrics = args.host_metrics and model == "NDP"
        if host_metrics:
            from jax import flatten_util as _flatten_util

            from ..models.pyramid import init_pyramid_params, warp_numpy

            with jax.default_device(_metric_device()):
                _tmpl = init_pyramid_params(jax.random.key(0), scfg.pyramid)
                _, unravel_params = _flatten_util.ravel_pytree(_tmpl)
            flat_params = jax.jit(
                lambda state: _flatten_util.ravel_pytree(state[0])[0])
        elif args.host_metrics:
            print("[warn] --host-metrics is NDP-only; using device metrics")

    for split in args.splits:
        ds = FourDMatchDataset(cfg.data_root, split)
        if len(ds) == 0:
            print(f"[skip] no data for split {split} under {cfg.data_root}")
            continue
        if args.limit is not None:
            ds.entries = ds.entries[: args.limit]
        if multi_host:
            ds.entries = ds.entries[jax.process_index()::jax.process_count()]
        n_total = len(ds)  # before resume filtering, for honest "done/total"
        logger = Logger(os.path.join(
            snap_dir,
            split + (f".p{jax.process_index()}" if multi_host else "") + ".log"))
        meters: dict[str, AverageMeter] = {}
        n_done = 0

        # eval-sweep resume: the .pairs.jsonl ledger records every finished
        # pair's metrics, so a resumed sweep both skips finished pairs AND
        # recovers their contribution to the final aggregates
        suffix = f".p{jax.process_index()}" if multi_host else ""
        done_path = os.path.join(snap_dir, split + suffix + ".done")
        ledger_path = os.path.join(snap_dir, split + suffix + ".pairs.jsonl")
        if args.resume and os.path.exists(done_path):
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
                            meters.setdefault(k2, AverageMeter()).update(v)
                n_done = len(recovered)
        n_recovered = n_done  # resume-recovered pairs: count toward the
        done_fw = open(done_path, "a")   # meters but not this run's rate
        ledger_fw = open(ledger_path, "a")

        stamps: list[float] = []   # harvest completion times -> per-pair summary

        def harvest(batch, out):
            """Sync one dispatched batch and fold its pairs into the meters."""
            nonlocal n_done
            if flow_scope == "subset":
                moved, s_valid, s_idx, _ = out
                moved, s_valid, s_idx = map(np.asarray, (moved, s_valid, s_idx))
                warped = None
            else:
                warped, _ = out
                warped = np.asarray(warped)
            seen = set()
            for j, ds_idx in enumerate(batch.indices):
                if ds_idx in seen:  # padding repeat of last pair
                    continue
                seen.add(ds_idx)
                # everything metric-side lives in the collated batch — no
                # npz re-read per pair (the dataset reload was ~1/3 of the
                # host time in the first full-suite sweep)
                ns = int(batch.src_valid[j].sum())
                p_src = batch.src[j, :ns]
                p_flow_gt = batch.flow_gt[j, :ns]
                p_overlap = batch.overlap[j, :ns]
                name = batch.names[j] if batch.names else str(ds_idx)
                # Metrics run jitted on the local CPU at the PADDED bucket
                # shape with a valid mask — per-pair true shapes would
                # trigger ~30 tiny eager compiles per distinct point count
                # (hundreds per sweep); bucket shapes compile ~5x total.
                with jax.default_device(_metric_device()):
                    if flow_scope == "subset":
                        # Sinkhorn evaluates on the moved sample subset
                        # (eval_nolearned.py:105-108); sel is data-dependent
                        # so this path keeps true shapes
                        sel = s_idx[j][s_valid[j]]
                        m = compute_flow_metrics(
                            jnp.array(moved[j][s_valid[j]] - p_src[sel]),
                            jnp.array(p_flow_gt[sel]),
                            overlap=jnp.array(p_overlap[sel]))
                    else:
                        m = _metrics_jit(
                            jnp.array(warped[j] - batch.src[j]),
                            jnp.array(batch.flow_gt[j]),
                            jnp.array(batch.overlap[j]),
                            jnp.array(batch.src_valid[j]))
                    row = {k2: float(v) for k2, v in m.items()}
                for k2, v in row.items():
                    meters.setdefault(k2, AverageMeter()).update(v)
                n_done += 1
                if args.visualize:
                    from ..utils.vis import visualize_pcds
                    w = (moved[j][s_valid[j]] if flow_scope == "subset"
                         else warped[j, :ns])
                    nt = int(batch.tgt_valid[j].sum())
                    visualize_pcds(
                        os.path.join(snap_dir, f"{split}-{n_done:04d}.png"),
                        src_pcd=p_src, tgt_pcd=batch.tgt[j, :nt], warped_pcd=w)
                ledger_fw.write(json.dumps(dict(row, name=name)) + "\n")
                ledger_fw.flush()
                done_fw.write(name + "\n")
                done_fw.flush()
            # one device sync covered the whole batch: record AMORTIZED
            # per-pair stamps (k equal diffs summing to the batch wall
            # time) so split_summary's per_pair_s stays a per-PAIR figure
            # on the legacy batched path too
            now = time.perf_counter()
            prev, k = stamps[-1], max(len(seen), 1)
            stamps.extend(prev + (now - prev) * (j + 1) / k
                          for j in range(k))

        def dispatch(batch):
            nonlocal key
            b = batch.src.shape[0]
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, b)
            return run_batch(keys, jnp.array(batch.src), jnp.array(batch.tgt),
                             jnp.array(batch.src_valid),
                             jnp.array(batch.tgt_valid))

        def harvest_fast(item):
            """Sync one pair's packed metric vector and fold into meters."""
            nonlocal n_done
            name, out, vis, host_data = item
            host_warped = None
            if host_data is not None:
                # --host-metrics: one ~150 KB flat-param fetch, then the
                # full-cloud warp + metrics run host-side (numpy warp +
                # CPU-jitted metrics at the padded bucket shape)
                packed, delta, ns_h = host_data
                flat_np = np.asarray(out)  # the ONLY device fetch
                with jax.default_device(_metric_device()):
                    # unravel on the LOCAL CPU — without the device pin the
                    # rebuilt leaves land on the tunneled TPU and each
                    # np.asarray below becomes a round trip (measured 4x
                    # slower than the device-metrics path it should beat)
                    params_np = jax.tree.map(
                        np.asarray, unravel_params(flat_np))
                # warp only the true rows; pad rows keep zero flow
                host_warped = warp_numpy(params_np, packed[:ns_h, :3],
                                         scfg.pyramid)
                flow = np.zeros((len(packed), 3), np.float32)
                flow[:ns_h] = (host_warped - packed[:ns_h, :3]
                               + np.asarray(delta))
                code = packed[:, 6]
                with jax.default_device(_metric_device()):
                    vals = np.asarray(_metrics_vec_jit(
                        jnp.array(flow), jnp.array(packed[:, 3:6]),
                        jnp.array(code > 0.5), jnp.array(code > -0.5)))
            else:
                vals = np.asarray(out)  # ONE device->host fetch, all metrics
            row = dict(zip(METRIC_KEYS, (float(v) for v in vals)))
            for k2, v in row.items():
                meters.setdefault(k2, AverageMeter()).update(v)
            n_done += 1
            if vis is not None:
                from ..utils.vis import visualize_pcds
                pair, warped_c, ns, tgt_mean = vis
                if warped_c is None:  # host-metrics mode
                    warped_c = host_warped
                visualize_pcds(
                    os.path.join(snap_dir, f"{split}-{n_done:04d}.png"),
                    src_pcd=pair.src, tgt_pcd=pair.tgt,
                    warped_pcd=np.asarray(warped_c)[:ns] + tgt_mean)
            ledger_fw.write(json.dumps(dict(row, name=name)) + "\n")
            ledger_fw.flush()
            done_fw.write(name + "\n")
            done_fw.flush()
            stamps.append(time.perf_counter())

        t_split = time.perf_counter()
        stamps.append(t_split)
        if use_fast:
            # Fixed-shape fast path: one compiled solver program for every
            # pair + a cheap bucketed warp/metrics program chained on-device,
            # dispatched async with a bounded in-flight window so host prep
            # overlaps device solves. Only one packed metric vector crosses
            # back per pair. The npz read + numpy packing AND the
            # host->device transfers run a few pairs ahead in worker
            # threads — the tunneled device pays a round trip per transfer,
            # and those waits release the GIL, so a small prefetch window
            # pipelines them behind the device compute.
            from concurrent.futures import ThreadPoolExecutor

            def prep(i):
                pair = ds[i]
                # stable per-pair seed: CRC of the file name, so a resumed
                # sweep (entries list filtered) samples identically
                pid = zlib.crc32(os.path.basename(pair.name).encode())
                rng = np.random.default_rng([args.seed, pid])
                ns = len(pair.src)
                src_mean = pair.src.mean(0)
                tgt_mean = pair.tgt.mean(0)
                st_packed = np.stack([
                    _prep_sample(pair.src, src_mean, scfg.samples, rng),
                    _prep_sample(pair.tgt, tgt_mean, scfg.samples, rng)])
                nb = _bucket_size(ns)
                packed = np.full((nb, 7), -1.0, np.float32)
                packed[:, :6] = 0.0
                packed[:ns, :3] = pair.src - src_mean
                packed[:ns, 3:6] = pair.flow_gt
                packed[:ns, 6] = pair.overlap.astype(np.float32)
                if host_metrics:
                    # warp+metrics stay host-side: don't ship the big
                    # [N, 7] block to the device at all
                    return (pair, pid, jnp.array(st_packed), packed, ns,
                            tgt_mean - src_mean)
                return (pair, pid, jnp.array(st_packed), jnp.array(packed),
                        ns, jnp.array(tgt_mean - src_mean))

            look_ahead = max(2, min(args.depth // 2, 8))
            pool = ThreadPoolExecutor(2)
            n_entries = len(ds.entries)
            futs = [pool.submit(prep, i)
                    for i in range(min(look_ahead, n_entries))]
            pending: list = []
            for i in range(n_entries):
                timers.tic("dispatch")
                pair, pid, st_packed, packed, ns, delta_mean = \
                    futs.pop(0).result()
                if i + look_ahead < n_entries:
                    futs.append(pool.submit(prep, i + look_ahead))
                # args.seed folds into pid so --seed changes solver RNG too
                state = solve_fixed(
                    np.int32((pid + args.seed) & 0x7FFFFFFF), st_packed)
                if host_metrics:
                    out = flat_params(state)
                    host_data = (packed, delta_mean, ns)
                else:
                    out = warp_metrics(state, packed, delta_mean)
                    host_data = None
                vis = None
                if args.visualize and not host_metrics:
                    vis = (pair, warp_bucket(state, packed), ns,
                           pair.tgt.mean(0))
                elif args.visualize:
                    # host mode renders from the host-side warp at harvest
                    vis = (pair, None, ns, pair.tgt.mean(0))
                timers.toc("dispatch")
                pending.append((pair.name, out, vis, host_data))
                if len(pending) > args.depth:
                    timers.tic("harvest")
                    harvest_fast(pending.pop(0))
                    timers.toc("harvest")
            while pending:
                timers.tic("harvest")
                harvest_fast(pending.pop(0))
                timers.toc("harvest")
            pool.shutdown(wait=False)
        elif args.stream:
            # B=1 async pipeline: each pair is its own program (no lockstep
            # tail — a batched while_loop runs to the slowest pair's
            # convergence), dispatched ahead so host-side metric/ledger work
            # overlaps device solves. Measured strictly faster than B>=4
            # batching on one chip (docs/PERFORMANCE.md round 2).
            pending: list = []
            for batch in BucketBatcher(ds, 1, square=args.square_buckets):
                timers.tic("dispatch")
                pending.append((batch, dispatch(batch)))
                timers.toc("dispatch")
                if len(pending) > args.depth:
                    timers.tic("harvest")
                    harvest(*pending.pop(0))
                    timers.toc("harvest")
            while pending:
                timers.tic("harvest")
                harvest(*pending.pop(0))
                timers.toc("harvest")
        else:
            for batch in BucketBatcher(ds, args.batch,
                                       square=args.square_buckets):
                timers.tic("registration")
                out = jax.tree.map(np.asarray, dispatch(batch))
                timers.toc("registration")
                harvest(batch, out)
        dt = time.perf_counter() - t_split
        n_this_run = n_done - n_recovered  # rate covers THIS run only —
        if n_this_run:                     # recovered pairs took no time here
            print(f"[{split}] {n_this_run} pairs in {dt:.1f}s "
                  f"= {n_this_run / dt:.2f} pairs/s")
            from ..utils.reporting import split_summary

            summary = split_summary("ndp_suite", split, stamps,
                                    n_this_run, dt)
            print(summary)
            logger.write(summary + "\n")

        msg = f"{n_done}/{n_total}: " + "\t".join(
            f"{k}: {v.avg:.3f}" for k, v in meters.items())
        logger.write(msg + "\n")
        print("score on", split, "\n", msg)

    print("time cost average")
    for line in timers.get_strings():
        print(line)


if __name__ == "__main__":
    main()
