"""Training loop for the outlier-rejection (NeCo) model.

Reference parity: ``correspondence/lib/trainer.py:17-276`` +
``correspondence/main.py:75-103``: the matcher runs frozen in eval mode,
NeCo trains with class-balanced BCE; SGD (momentum+weight-decay) or Adam
with exponential/multi-step LR; gradient accumulation over ``iter_size``;
NaN/Inf gradient guard (``lib/utils.py:103-113``); best-loss snapshots.

The step is one jitted function (matcher forward under stop_gradient +
NeCo forward/backward); data pyramids stream from the host collate.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..match.landmark import LandmarkConfig
from ..match.losses import neco_loss
from ..match.outlier_rejection import apply_neco
from ..match.pipeline import apply_matcher
from ..utils.checkpoint import save_pytree
from ..utils.logging import AverageMeter

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    optimizer: str = "SGD"           # 'SGD' | 'Adam'
    lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-6
    scheduler: str = "ExpLR"
    scheduler_gamma: float = 0.99    # per-epoch exponential decay
    iter_size: int = 1               # gradient accumulation
    max_epoch: int = 10
    grad_clip: float | None = None
    inlier_thr: float = 0.1
    snapshot_dir: str = "snapshot/neco"


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = optax.exponential_decay(
        cfg.lr, transition_steps=max(steps_per_epoch, 1),
        decay_rate=cfg.scheduler_gamma, staircase=True)
    if cfg.optimizer == "SGD":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(sched, momentum=cfg.momentum))
    elif cfg.optimizer == "Adam":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(sched))
    else:
        raise KeyError(cfg.optimizer)
    if cfg.grad_clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def valid_gradient(grads: Any) -> Array:
    """NaN/Inf gradient guard (reference ``lib/utils.py:103-113``)."""
    leaves = jax.tree.leaves(grads)
    ok = jnp.bool_(True)
    for g in leaves:
        ok = ok & jnp.isfinite(g).all()
    return ok


def make_neco_train_step(matcher_params: dict, lcfg: LandmarkConfig,
                         opt: optax.GradientTransformation):
    """Build the jitted (loss, grads, update) step for one pair."""

    def loss_fn(neco_params, pyramid, src_len_c, tgt_len_c, coarse_flow,
                gt_rot, gt_trn):
        data = apply_matcher(jax.lax.stop_gradient(matcher_params), pyramid,
                             src_len_c, tgt_len_c, lcfg.matcher)
        conf = apply_neco(neco_params, data["vec_6d"], data["vec_6d_mask"],
                          lcfg.neco)
        loss, info = neco_loss(conf, data["vec_6d"], data["vec_6d_mask"],
                               data["vec_6d_ind"], data["s_pcd"], coarse_flow,
                               gt_rot, gt_trn)
        return loss, info

    @jax.jit
    def step(neco_params, opt_state, pyramid, src_len_c, tgt_len_c,
             coarse_flow, gt_rot, gt_trn):
        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            neco_params, pyramid, src_len_c, tgt_len_c, coarse_flow,
            gt_rot, gt_trn)
        ok = valid_gradient(grads)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, opt_state = opt.update(grads, opt_state, neco_params)
        new_params = optax.apply_updates(neco_params, updates)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old)
        return keep(new_params, neco_params), opt_state, loss, info, ok

    return step


def train_neco(matcher_params: dict, neco_params: dict, lcfg: LandmarkConfig,
               cfg: TrainConfig, train_batches: Callable[[], Iterable[dict]],
               steps_per_epoch: int, log_fn=print) -> dict:
    """Epoch loop; ``train_batches()`` yields device-ready dicts with keys
    pyramid/src_len_c/tgt_len_c/coarse_flow/gt_rot/gt_trn."""
    opt = make_optimizer(cfg, steps_per_epoch)
    opt_state = opt.init(neco_params)
    step = make_neco_train_step(matcher_params, lcfg, opt)
    best = np.inf
    for epoch in range(cfg.max_epoch):
        meter = AverageMeter()
        ir_meter = AverageMeter()
        for batch in train_batches():
            neco_params, opt_state, loss, info, ok = step(
                neco_params, opt_state, batch["pyramid"],
                batch["src_len_c"], batch["tgt_len_c"],
                batch["coarse_flow"], batch["gt_rot"], batch["gt_trn"])
            meter.update(float(loss))
            ir_meter.update(float(info["IR_neco"]))
        log_fn(f"epoch {epoch}: loss {meter.avg:.4f} IR_neco {ir_meter.avg:.3f}")
        if meter.avg < best:
            best = meter.avg
            save_pytree(f"{cfg.snapshot_dir}/model_best_loss.npz", neco_params,
                        meta={"epoch": epoch, "loss": best})
        save_pytree(f"{cfg.snapshot_dir}/model_last.npz", neco_params,
                    meta={"epoch": epoch, "loss": meter.avg})
    return neco_params
