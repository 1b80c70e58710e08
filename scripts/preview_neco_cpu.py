"""CPU preview of NeCo training on cached frozen-matcher match sets.

The NeCo trainer's matcher is frozen; with --no-augment its per-pair
match set is deterministic, so NeCo's learnability on a split can be
previewed WITHOUT chip time: cache each pair's (vec_6d, mask, index,
s_pcd, coarse_flow, gt) once through the matcher on CPU, then train the
full-size NeCo on the cached sets and report inlier/outlier confidence
separation on held-out pairs. Predicts whether an on-chip retrain will
produce a discriminative filter before spending the chip hours.

Usage:
  python scripts/preview_neco_cpu.py --weights snapshot/landmark_trained_occ_noaug.npz \
      --split train-occ-b [--pairs 12] [--holdout 3] [--steps 600]
"""
import argparse
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deformationpyramid_tpu.data.collate import (
    build_pair_pyramid, calibrate_neighborhood_limits)
from deformationpyramid_tpu.data.fourdmatch import FourDMatchDataset
from deformationpyramid_tpu.match.backbone import KPFCN_ARCHITECTURE
from deformationpyramid_tpu.match.config_loader import landmark_config_from_yaml
from deformationpyramid_tpu.match.landmark import init_landmark_model
from deformationpyramid_tpu.match.losses import compute_inlier_mask, neco_loss
from deformationpyramid_tpu.match.outlier_rejection import apply_neco
from deformationpyramid_tpu.match.pipeline import apply_matcher
from deformationpyramid_tpu.utils.checkpoint import load_pytree
from deformationpyramid_tpu.utils.config import load_config
from deformationpyramid_tpu.cli.eval_supervised import interp_flow


def cache_matches(params, lcfg, ds, n_pairs, cache_path):
    if os.path.exists(cache_path):
        z = np.load(cache_path, allow_pickle=True)
        return list(z["sets"])
    sample_pairs = [(ds[i].src, ds[i].tgt) for i in range(min(3, len(ds)))]
    limits = calibrate_neighborhood_limits(sample_pairs, lcfg.matcher.kpfcn,
                                           KPFCN_ARCHITECTURE)
    infer = jax.jit(
        lambda p, pyr, sl, tl, s_cap, t_cap: apply_matcher(
            p, pyr, sl, tl, lcfg.matcher, s_cap=s_cap, t_cap=t_cap),
        static_argnums=(4, 5))
    sets = []
    for i in range(min(n_pairs, len(ds))):
        t0 = time.time()
        pair = ds[i]
        pyr = build_pair_pyramid(pair.src, pair.tgt, lcfg.matcher.kpfcn,
                                 KPFCN_ARCHITECTURE, limits)
        pyrd = {"points": [jnp.array(p) for p in pyr.points],
                "valids": [jnp.array(v) for v in pyr.valids],
                "neighbors": [jnp.array(x) for x in pyr.neighbors],
                "pools": [jnp.array(x) for x in pyr.pools],
                "upsamples": [jnp.array(x) for x in pyr.upsamples],
                "features": jnp.array(pyr.features)}
        cl = lcfg.matcher.coarse_level
        cap = 512
        while cap < max(int(pyr.src_lengths[cl]), int(pyr.tgt_lengths[cl])):
            cap *= 2
        data = infer(params["matcher"], pyrd,
                     jnp.int32(pyr.src_lengths[cl]),
                     jnp.int32(pyr.tgt_lengths[cl]), cap, cap)
        s_pcd = np.asarray(data["s_pcd"])
        coarse_flow = interp_flow(s_pcd, pair)
        sets.append(dict(
            vec6d=np.asarray(data["vec_6d"]),
            mask=np.asarray(data["vec_6d_mask"]),
            idx=np.asarray(data["vec_6d_ind"]),
            s_pcd=s_pcd, coarse_flow=coarse_flow.astype(np.float32),
            rot=pair.rot.astype(np.float32),
            trn=pair.trans.astype(np.float32)))
        print(f"cached pair {i}: {int(sets[-1]['mask'].sum())} matches "
              f"({time.time()-t0:.0f}s)", flush=True)
    np.savez(cache_path, sets=np.array(sets, dtype=object))
    return sets


def separation(conf, labels, valid):
    conf, labels = conf[valid], labels[valid]
    if labels.all() or not labels.any():
        return float("nan")
    return float(conf[labels].mean() - conf[~labels].mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config/LNDP.yaml")
    ap.add_argument("--weights", required=True)
    ap.add_argument("--split", default="train-occ-b")
    ap.add_argument("--pairs", type=int, default=12)
    ap.add_argument("--holdout", type=int, default=3)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--cache", default="/tmp/neco_preview_cache.npz")
    ap.add_argument("--cap", type=int, default=1024,
                    help="compact match rows (by mask) to this capacity — "
                    "the NeCo attention is O(cap^2), and cached caps come "
                    "from the coarse-cloud size (4096), far above the "
                    "actual match counts (~800)")
    args = ap.parse_args()

    cfg = load_config(args.config)
    lcfg = landmark_config_from_yaml(cfg["ldmk_config"])
    params = init_landmark_model(jax.random.key(0), lcfg)
    params = load_pytree(args.weights, params)

    ds = FourDMatchDataset(cfg["data_root"], args.split, augment=False)
    sets = cache_matches(params, lcfg, ds, args.pairs, args.cache)
    for s in sets:  # compact match rows; s_pcd/coarse_flow stay idx-indexed
        order = np.argsort(~s["mask"].astype(bool), kind="stable")[:args.cap]
        for k in ("vec6d", "mask", "idx"):
            s[k] = s[k][order]
    train_sets, hold_sets = sets[args.holdout:], sets[:args.holdout]
    print(f"{len(train_sets)} train / {len(hold_sets)} holdout pairs")

    neco = params["neco"]
    # reference optimizer family (main.py:75-103): SGD momentum like the
    # shipped config; the trainer uses the same via TrainConfig
    opt = optax.sgd(args.lr, momentum=0.9)
    opt_state = opt.init(neco)

    @jax.jit
    def step(neco, opt_state, vec6d, mask, idx, s_pcd, coarse_flow, rot, trn):
        def loss_fn(p):
            conf = apply_neco(p, vec6d, mask, lcfg.neco)
            return neco_loss(conf, vec6d, mask, idx, s_pcd, coarse_flow,
                             rot, trn)
        (loss, info), g = jax.value_and_grad(loss_fn, has_aux=True)(neco)
        upd, opt_state = opt.update(g, opt_state, neco)
        return optax.apply_updates(neco, upd), opt_state, loss, info

    @jax.jit
    def infer_conf(neco, vec6d, mask):
        return apply_neco(neco, vec6d, mask, lcfg.neco)

    def report(tag):
        seps, irs = [], []
        for s in hold_sets:
            conf = np.asarray(infer_conf(neco, jnp.array(s["vec6d"]),
                                         jnp.array(s["mask"])))
            labels = np.asarray(compute_inlier_mask(
                jnp.array(s["vec6d"]), jnp.array(s["mask"]),
                jnp.array(s["idx"]), jnp.array(s["s_pcd"]),
                jnp.array(s["coarse_flow"]), jnp.array(s["rot"]),
                jnp.array(s["trn"])))
            valid = s["mask"].astype(bool)
            seps.append(separation(conf, labels, valid))
            kept = valid & (conf > 0.3)
            irs.append((labels[valid].mean(),
                        labels[kept].mean() if kept.any() else float("nan"),
                        kept.sum() / max(valid.sum(), 1)))
        print(f"[{tag}] holdout separation (mean conf inl - outl): "
              f"{np.nanmean(seps):+.4f}; per-pair IR pre->post(keep%): "
              + "  ".join(f"{a:.3f}->{b:.3f}({k:.2f})" for a, b, k in irs),
              flush=True)

    report("init")
    t0 = time.time()
    for it in range(args.steps):
        s = train_sets[it % len(train_sets)]
        neco, opt_state, loss, info = step(
            neco, opt_state, jnp.array(s["vec6d"]), jnp.array(s["mask"]),
            jnp.array(s["idx"]), jnp.array(s["s_pcd"]),
            jnp.array(s["coarse_flow"]), jnp.array(s["rot"]),
            jnp.array(s["trn"]))
        if (it + 1) % 100 == 0:
            print(f"step {it+1}: loss {float(loss):.4f} "
                  f"IR_neco {float(info['IR_neco']):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            report(f"step{it+1}")


if __name__ == "__main__":
    main()
