"""Train the multiview (correspondence-graph GAT) outlier-rejection model.

Driver for the multiview stack (reference
``correspondence/cycle_consistency.py`` — upstream it is effectively dead
code with no runnable entry point; here the path is drivable end-to-end):
per view-pair candidate matches become 6D vectors, matches sharing a point
cloud are linked into a correspondence graph
(``creat_graph_of_correspondences``, ``cycle_consistency.py:166-231``), and
the alternating attention/GAT confidence model trains with class-balanced
BCE on GT inlier labels derived from the pairwise flows.

Candidate matches are the GT correspondences with a planted outlier
fraction (the upstream trainer consumed a pretrained matcher's matches; the
fabricated multiview suite carries exact flows, so planting outliers gives
a controlled, checkpoint-free training signal).

Usage:
  python -m deformationpyramid_tpu.cli.train_multiview --data-root data/split \
      [--split multiview-train] [--epochs 10] [--k 64]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.fourdmatch_multiview import FourDMatchMultiview
from ..match.losses import balanced_bce
from ..match.multiview import (
    MultiviewNeCoConfig, apply_multiview_neco, build_correspondence_graph,
    init_multiview_neco,
)
from ..match.outlier_rejection import NeCoConfig
from ..utils.checkpoint import save_pytree
from ..utils.logging import AverageMeter


def make_training_batch(sample, k: int, outlier_rate: float,
                        max_pairs: int, max_edges: int,
                        rng: np.random.Generator, edge_radius: float):
    """One multiview sample -> (vec6d [P,K,6], mask, labels, edges)."""
    n_pairs = min(len(sample.pcd_pairs), max_pairs)
    n = sample.pcds.shape[1]
    vec6d = np.zeros((max_pairs, k, 6), np.float32)
    mask = np.zeros((max_pairs, k), bool)
    labels = np.zeros((max_pairs, k), bool)
    for p in range(n_pairs):
        a, b = sample.pcd_pairs[p]
        idx = rng.permutation(n)[:k]
        src = sample.pcds[a][idx]
        tgt = src + sample.pairwise_flows[p][idx]
        out = rng.random(len(idx)) < outlier_rate
        wrong = sample.pcds[b][rng.integers(0, n, len(idx))]
        tgt = np.where(out[:, None], wrong, tgt)
        kk = len(idx)
        vec6d[p, :kk] = np.concatenate([src, tgt], 1)
        mask[p, :kk] = True
        labels[p, :kk] = ~out
    es, et, ev = build_correspondence_graph(
        vec6d, mask, sample.pcd_pairs[:n_pairs], edge_radius, max_edges)
    return vec6d, mask, labels, es, et, ev


def main():
    from ..utils.compilation_cache import enable as _enable_cache
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split", default="multiview-train")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--k", type=int, default=64,
                    help="candidate matches per view pair")
    ap.add_argument("--max-pairs", type=int, default=12)
    ap.add_argument("--max-edges", type=int, default=16384)
    ap.add_argument("--outlier-rate", type=float, default=0.4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--feature-dim", type=int, default=144)
    ap.add_argument("--num-layers", type=int, default=3)
    ap.add_argument("--snapshot-dir", default="snapshot/multiview")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    ds = FourDMatchMultiview(args.data_root, args.split)
    if len(ds) == 0:
        raise SystemExit(f"no multiview data under "
                         f"{args.data_root}/{args.split}")

    cfg = MultiviewNeCoConfig(neco=NeCoConfig(
        feature_dim=args.feature_dim, num_layers=args.num_layers))
    params = init_multiview_neco(jax.random.key(args.seed), cfg)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, vec6d, mask, labels, es, et, ev):
        def loss_fn(pp):
            conf = apply_multiview_neco(pp, vec6d, mask, es, et, ev, cfg)
            loss = balanced_bce(conf, labels, mask)
            kept = mask & (conf > 0.5)
            ir_before = jnp.sum(labels & mask) / jnp.maximum(jnp.sum(mask), 1)
            ir_after = jnp.sum(labels & kept) / jnp.maximum(jnp.sum(kept), 1)
            return loss, {"IR_before": ir_before, "IR_after": ir_after}

        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, info

    os.makedirs(args.snapshot_dir, exist_ok=True)
    history = os.path.join(args.snapshot_dir, "history.jsonl")
    rng = np.random.default_rng(args.seed)
    best = np.inf
    for epoch in range(args.epochs):
        meter, irb, ira = AverageMeter(), AverageMeter(), AverageMeter()
        for i in range(len(ds)):
            batch = make_training_batch(
                ds[i], args.k, args.outlier_rate, args.max_pairs,
                args.max_edges, rng, cfg.edge_search_radius)
            params, opt_state, loss, info = step(
                params, opt_state, *[jnp.array(x) for x in batch])
            meter.update(float(loss))
            irb.update(float(info["IR_before"]))
            ira.update(float(info["IR_after"]))
        print(f"epoch {epoch}: loss {meter.avg:.4f} "
              f"IR {irb.avg:.3f} -> {ira.avg:.3f}")
        with open(history, "a") as f:
            f.write(json.dumps({"epoch": epoch, "loss": meter.avg,
                                "IR_before": irb.avg,
                                "IR_after": ira.avg}) + "\n")
        if meter.avg < best:
            best = meter.avg
            save_pytree(os.path.join(args.snapshot_dir, "model_best_loss.npz"),
                        params, meta={"epoch": epoch, "loss": best})
    save_pytree(os.path.join(args.snapshot_dir, "model_last.npz"), params,
                meta={"epoch": args.epochs - 1})


if __name__ == "__main__":
    main()
