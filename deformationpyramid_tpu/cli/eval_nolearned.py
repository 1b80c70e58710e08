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

import numpy as np

import jax
import jax.numpy as jnp

from ..data.fourdmatch import BucketBatcher, FourDMatchDataset
from ..metrics.flow import compute_flow_metrics
from ..models.pyramid import NDPConfig
from ..solve.registration import SolverConfig, register_batch
from ..solve.baselines import (
    NSFPSolverConfig, NerfiesSolverConfig, SinkhornSolverConfig,
    register_nsfp, register_nerfies, register_sinkhorn,
)
from ..utils.config import AttrDict, load_config
from ..utils.logging import AverageMeter, Logger, write_run_provenance
from ..utils.timers import Timers


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
        )
        fn = lambda keys, s, t, sv, tv: register_batch(keys, s, t, scfg, sv, tv)
        return scfg, jax.jit(fn), "full"
    if model == "NSFP":
        scfg = NSFPSolverConfig(
            iters=cfg.get("iters", 5000), lr=cfg.get("lr", 0.01),
            max_break_count=cfg.get("max_break_count", 70),
            break_threshold_ratio=cfg.get("break_threshold_ratio", 0.001),
            samples=cfg.get("samples", 2000))
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


def _metric_device():
    """Local CPU device for per-pair metric math (falls back to default)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


@jax.jit
def _metrics_jit(flow, flow_gt, overlap, valid):
    return compute_flow_metrics(flow, flow_gt, overlap=overlap, valid=valid)


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
    args = ap.parse_args()

    # multi-host eval sweep over DCN (SURVEY.md §2.4): when a coordinator is
    # configured each process takes a strided shard of the pair list
    from ..parallel.mesh import initialize_distributed

    multi_host = initialize_distributed()

    cfg = load_config(args.config)
    snap_dir = os.path.join("snapshot", str(cfg.get("folder", "eval")),
                            str(cfg.get("exp_dir", "run")))
    os.makedirs(snap_dir, exist_ok=True)
    write_run_provenance(snap_dir, args.config)

    scfg, run_batch, flow_scope = solver_from_config(cfg)
    timers = Timers()
    key = jax.random.key(args.seed)

    for split in args.splits:
        ds = FourDMatchDataset(cfg.data_root, split)
        if len(ds) == 0:
            print(f"[skip] no data for split {split} under {cfg.data_root}")
            continue
        if args.limit is not None:
            ds.entries = ds.entries[: args.limit]
        if multi_host:
            ds.entries = ds.entries[jax.process_index()::jax.process_count()]
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
        done_fw = open(done_path, "a")
        ledger_fw = open(ledger_path, "a")

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

        def dispatch(batch):
            nonlocal key
            b = batch.src.shape[0]
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, b)
            return run_batch(keys, jnp.array(batch.src), jnp.array(batch.tgt),
                             jnp.array(batch.src_valid),
                             jnp.array(batch.tgt_valid))

        t_split = time.perf_counter()
        if args.stream:
            # B=1 async pipeline: each pair is its own program (no lockstep
            # tail — a batched while_loop runs to the slowest pair's
            # convergence), dispatched ahead so host-side metric/ledger work
            # overlaps device solves. Measured strictly faster than B>=4
            # batching on one chip (docs/PERFORMANCE.md round 2).
            pending: list = []
            for batch in BucketBatcher(ds, 1, square=args.square_buckets):
                pending.append((batch, dispatch(batch)))
                if len(pending) > args.depth:
                    harvest(*pending.pop(0))
            while pending:
                harvest(*pending.pop(0))
        else:
            for batch in BucketBatcher(ds, args.batch,
                                       square=args.square_buckets):
                timers.tic("registration")
                out = jax.tree.map(np.asarray, dispatch(batch))
                timers.toc("registration")
                harvest(batch, out)
        dt = time.perf_counter() - t_split
        if n_done:
            print(f"[{split}] {n_done} pairs in {dt:.1f}s "
                  f"= {n_done / dt:.2f} pairs/s")

        msg = f"{n_done}/{len(ds)}: " + "\t".join(
            f"{k}: {v.avg:.3f}" for k, v in meters.items())
        logger.write(msg + "\n")
        print("score on", split, "\n", msg)

    print("time cost average")
    for line in timers.get_strings():
        print(line)


if __name__ == "__main__":
    main()
