"""Training loop for the outlier-rejection (NeCo) model.

Reference parity: ``correspondence/lib/trainer.py:17-276`` +
``correspondence/main.py:75-103``: the matcher runs frozen in eval mode,
NeCo trains with class-balanced BCE; SGD (momentum+weight-decay) or Adam
with exponential/multi-step LR; gradient accumulation over ``iter_size``
(summed grads, step every iter_size batches, ``lib/trainer.py:195-201``);
NaN/Inf gradient guard (``lib/utils.py:103-113``); best-loss snapshots
selected on the validation split when one is provided
(``lib/trainer.py:266-271``); per-epoch scalar history JSONL.

The step is one jitted function (matcher forward under stop_gradient +
NeCo forward/backward); data pyramids stream from the host collate.
"""
from __future__ import annotations

import dataclasses
import sys
from typing import Any, Callable, Iterable

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..match.landmark import LandmarkConfig
from ..match.losses import MatchLossConfig, match_motion_loss, neco_loss
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
    scheduler: str = "ExpLR"         # 'ExpLR' | 'MultiStepLR'
    scheduler_gamma: float = 0.99    # per-epoch decay (ExpLR) / step scale
    lr_milestones: tuple[int, ...] = ()  # epochs, MultiStepLR only
    iter_size: int = 1               # gradient accumulation
    max_epoch: int = 10
    grad_clip: float | None = None
    inlier_thr: float = 0.1
    snapshot_dir: str = "snapshot/neco"


def make_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    """LR schedule in optimizer-update steps (the reference steps its
    scheduler once per epoch, ``lib/trainer.py:255``).

    'MultiStepLR' scales by gamma at each milestone epoch
    (``correspondence/main.py:90-97``, used with milestones=[max_epoch-1],
    gamma=0.1 for overfit runs); 'ExpLR' decays by gamma per epoch
    (``main.py:99-103``).
    """
    spe = max(steps_per_epoch, 1)
    if cfg.scheduler == "MultiStepLR":
        return optax.piecewise_constant_schedule(
            cfg.lr, {int(m) * spe: cfg.scheduler_gamma
                     for m in cfg.lr_milestones})
    if cfg.scheduler == "ExpLR":
        return optax.exponential_decay(
            cfg.lr, transition_steps=spe,
            decay_rate=cfg.scheduler_gamma, staircase=True)
    raise KeyError(cfg.scheduler)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = make_schedule(cfg, steps_per_epoch)
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


def make_neco_loss_fn(matcher_params: dict, lcfg: LandmarkConfig,
                      s_cap: int | None = None, t_cap: int | None = None):
    """Matcher-frozen NeCo loss for one pair (``lib/trainer.py:117-139``).

    ``s_cap``/``t_cap``: static per-cloud coarse caps (see
    ``match.pipeline.apply_matcher``) — without them the frozen matcher
    forward pads both clouds to the full stacked coarse size (~4x work).
    """

    def loss_fn(neco_params, pyramid, src_len_c, tgt_len_c, coarse_flow,
                gt_rot, gt_trn):
        data = apply_matcher(jax.lax.stop_gradient(matcher_params), pyramid,
                             src_len_c, tgt_len_c, lcfg.matcher,
                             s_cap=s_cap, t_cap=t_cap)
        conf = apply_neco(neco_params, data["vec_6d"], data["vec_6d_mask"],
                          lcfg.neco)
        loss, info = neco_loss(conf, data["vec_6d"], data["vec_6d_mask"],
                               data["vec_6d_ind"], data["s_pcd"], coarse_flow,
                               gt_rot, gt_trn)
        return loss, info

    return loss_fn


def make_neco_train_step(matcher_params: dict, lcfg: LandmarkConfig,
                         opt: optax.GradientTransformation,
                         s_cap: int | None = None, t_cap: int | None = None):
    """Build the jitted (loss, grads, update) step for one pair."""
    loss_fn = make_neco_loss_fn(matcher_params, lcfg, s_cap=s_cap,
                                t_cap=t_cap)

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


def make_neco_accum_fns(matcher_params: dict, lcfg: LandmarkConfig,
                        opt: optax.GradientTransformation,
                        s_cap: int | None = None, t_cap: int | None = None):
    """(grads_fn, apply_fn) pair implementing ``iter_size`` accumulation.

    Mirrors the reference exactly (``lib/trainer.py:185-201``): per-batch
    ``backward()`` SUMS gradients into the accumulator (no 1/iter_size
    scaling), the optimizer steps once every ``iter_size`` batches, the
    NaN/Inf guard runs on the ACCUMULATED gradient at step time and skips
    the whole step when it fails (``zero_grad`` still clears the buffer).

    ``s_cap``/``t_cap``: static coarse caps — without them the frozen
    matcher forward runs at the FULL stacked coarse pad (~16x the [S, T]
    work at 8k coarse points, and a much bigger compile).
    """
    loss_fn = make_neco_loss_fn(matcher_params, lcfg, s_cap=s_cap,
                                t_cap=t_cap)

    @jax.jit
    def grads_fn(neco_params, accum, pyramid, src_len_c, tgt_len_c,
                 coarse_flow, gt_rot, gt_trn):
        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            neco_params, pyramid, src_len_c, tgt_len_c, coarse_flow,
            gt_rot, gt_trn)
        accum = jax.tree.map(jnp.add, accum, grads)
        return accum, loss, info

    @jax.jit
    def apply_fn(neco_params, opt_state, accum):
        ok = valid_gradient(accum)
        updates, new_opt_state = opt.update(accum, opt_state, neco_params)
        new_params = optax.apply_updates(neco_params, updates)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old)
        zeros = jax.tree.map(jnp.zeros_like, accum)
        return (keep(new_params, neco_params), keep(new_opt_state, opt_state),
                zeros, ok)

    return grads_fn, apply_fn


def make_matcher_train_step(lcfg: LandmarkConfig,
                            opt: optax.GradientTransformation,
                            s_cap: int | None = None,
                            t_cap: int | None = None,
                            loss_cfg: MatchLossConfig = MatchLossConfig()):
    """Jitted MatchMotionLoss step training the FULL matcher.

    The reference trains its matcher in the upstream Lepard repo and ships
    checkpoints (``landmark_estimator.py:33-39``); here the training
    surface is first-class so the end-to-end system can be demonstrated to
    learn without external weights (focal + rigid-motion loss semantics per
    ``lepard/loss.py:80-188``).
    """

    @jax.jit
    def step(matcher_params, opt_state, pyramid, src_len_c, tgt_len_c,
             match_gt, match_gt_valid, coarse_flow, gt_rot, gt_trn):
        def loss_fn(mp):
            data = apply_matcher(mp, pyramid, src_len_c, tgt_len_c,
                                 lcfg.matcher, s_cap=s_cap, t_cap=t_cap)
            return match_motion_loss(data, match_gt, match_gt_valid,
                                     coarse_flow, gt_rot, gt_trn, loss_cfg)

        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            matcher_params)
        ok = valid_gradient(grads)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, new_opt_state = opt.update(grads, opt_state, matcher_params)
        new_params = optax.apply_updates(matcher_params, updates)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old)
        return (keep(new_params, matcher_params),
                keep(new_opt_state, opt_state), loss, info, ok)

    return step


def train_matcher(matcher_params: dict, lcfg: LandmarkConfig,
                  cfg: TrainConfig,
                  train_batches: Callable[[], Iterable[dict]],
                  steps_per_epoch: int, log_fn=print) -> dict:
    """Matcher training loop (MatchMotionLoss, per-pair steps).

    ``train_batches()`` yields dicts with pyramid/src_len_c/tgt_len_c/
    match_gt/match_gt_valid/coarse_flow/gt_rot/gt_trn and STATIC
    ``s_cap``/``t_cap`` ints; one compiled step per distinct cap pair
    (keep the data bucketed — every new cap pair costs a full matcher
    fwd+bwd compile).
    """
    import json
    import os

    opt = make_optimizer(cfg, steps_per_epoch)
    opt_state = opt.init(matcher_params)
    steps: dict[tuple[int, int], Any] = {}

    log_fn(f"training matcher: {cfg.max_epoch} epochs x {steps_per_epoch} "
           "steps (the first step per shape bucket compiles the full "
           "fwd+bwd matcher - up to ~45 min cold via the remote tunnel)")
    sys.stdout.flush()
    os.makedirs(cfg.snapshot_dir, exist_ok=True)
    history_path = f"{cfg.snapshot_dir}/history.jsonl"
    best = np.inf
    for epoch in range(cfg.max_epoch):
        meter = AverageMeter()
        rec = AverageMeter()
        prec = AverageMeter()
        for batch in train_batches():
            caps = (int(batch["s_cap"]), int(batch["t_cap"]))
            if caps not in steps:
                steps[caps] = make_matcher_train_step(
                    lcfg, opt, s_cap=caps[0], t_cap=caps[1])
            matcher_params, opt_state, loss, info, ok = steps[caps](
                matcher_params, opt_state, batch["pyramid"],
                batch["src_len_c"], batch["tgt_len_c"], batch["match_gt"],
                batch["match_gt_valid"], batch["coarse_flow"],
                batch["gt_rot"], batch["gt_trn"])
            if not bool(ok):
                log_fn("gradient not valid")
            meter.update(float(loss))
            rec.update(float(info["recall_coarse"]))
            prec.update(float(info["precision_coarse"]))
        log_fn(f"epoch {epoch}: match loss {meter.avg:.4f} "
               f"recall {rec.avg:.3f} precision {prec.avg:.3f}")
        with open(history_path, "a") as f:
            f.write(json.dumps({
                "epoch": epoch, "phase": "train", "loss": meter.avg,
                "recall_coarse": rec.avg, "precision_coarse": prec.avg,
            }) + "\n")
        if meter.avg < best:
            best = meter.avg
            save_pytree(f"{cfg.snapshot_dir}/matcher_best_loss.npz",
                        matcher_params, meta={"epoch": epoch, "loss": best})
        save_pytree(f"{cfg.snapshot_dir}/matcher_last.npz", matcher_params,
                    meta={"epoch": epoch, "loss": meter.avg})
    return matcher_params


def make_neco_eval_step(matcher_params: dict, lcfg: LandmarkConfig,
                        s_cap: int | None = None, t_cap: int | None = None):
    """Jitted loss-only step for the validation split (no update)."""
    loss_fn = make_neco_loss_fn(matcher_params, lcfg, s_cap=s_cap,
                                t_cap=t_cap)

    @jax.jit
    def step(neco_params, pyramid, src_len_c, tgt_len_c, coarse_flow,
             gt_rot, gt_trn):
        return loss_fn(neco_params, pyramid, src_len_c, tgt_len_c,
                       coarse_flow, gt_rot, gt_trn)

    return step


def _batch_args(batch: dict) -> tuple:
    return (batch["pyramid"], batch["src_len_c"], batch["tgt_len_c"],
            batch["coarse_flow"], batch["gt_rot"], batch["gt_trn"])


def train_neco(matcher_params: dict, neco_params: dict, lcfg: LandmarkConfig,
               cfg: TrainConfig, train_batches: Callable[[], Iterable[dict]],
               steps_per_epoch: int, log_fn=print,
               val_batches: Callable[[], Iterable[dict]] | None = None) -> dict:
    """Epoch loop; ``train_batches()`` yields device-ready dicts with keys
    pyramid/src_len_c/tgt_len_c/coarse_flow/gt_rot/gt_trn.

    Model selection mirrors the reference (``lib/trainer.py:246-274``):
    when ``val_batches`` is given, the best-loss snapshot tracks the
    validation loss after each epoch; otherwise the train loss (the
    reference's 'overfit' path). Per-epoch scalars (loss, IR_neco, lr per
    phase) append to ``<snapshot_dir>/history.jsonl`` (the reference's
    tensorboardX scalars, ``trainer.py:216-218,230-234``).
    """
    import json
    import os

    opt_steps_per_epoch = max(steps_per_epoch // max(cfg.iter_size, 1), 1)
    opt = make_optimizer(cfg, opt_steps_per_epoch)
    sched = make_schedule(cfg, opt_steps_per_epoch)
    opt_state = opt.init(neco_params)
    # one compiled grads/eval fn per static coarse-cap pair (batches carry
    # optional "s_cap"/"t_cap" ints; see make_neco_accum_fns docstring)
    grads_fns: dict[tuple, Any] = {}
    eval_steps: dict[tuple, Any] = {}
    apply_fn_box: list = []

    def get_grads_fn(batch):
        caps = (batch.get("s_cap"), batch.get("t_cap"))
        if caps not in grads_fns:
            g, a = make_neco_accum_fns(matcher_params, lcfg, opt,
                                       s_cap=caps[0], t_cap=caps[1])
            grads_fns[caps] = g
            if not apply_fn_box:
                apply_fn_box.append(a)  # caps-independent
        return grads_fns[caps]

    def get_eval_step(batch):
        caps = (batch.get("s_cap"), batch.get("t_cap"))
        if caps not in eval_steps:
            eval_steps[caps] = make_neco_eval_step(
                matcher_params, lcfg, s_cap=caps[0], t_cap=caps[1])
        return eval_steps[caps]

    os.makedirs(cfg.snapshot_dir, exist_ok=True)
    history_path = f"{cfg.snapshot_dir}/history.jsonl"

    def write_history(epoch: int, phase: str, meters: dict[str, AverageMeter],
                      n_opt_steps: int) -> None:
        row = {"epoch": epoch, "phase": phase,
               "lr": float(sched(jnp.int32(n_opt_steps)))}
        row.update({k: m.avg for k, m in meters.items()})
        with open(history_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    best = np.inf
    n_opt_steps = 0
    # gradient buffer persists across epoch boundaries exactly like torch's
    # (zero_grad only runs at step time, trainer.py:200)
    accum = jax.tree.map(jnp.zeros_like, neco_params)
    c_iter = 0
    for epoch in range(cfg.max_epoch):
        meter = AverageMeter()
        ir_meter = AverageMeter()
        for batch in train_batches():
            accum, loss, info = get_grads_fn(batch)(neco_params, accum,
                                                    *_batch_args(batch))
            c_iter += 1
            if c_iter % max(cfg.iter_size, 1) == 0:
                neco_params, opt_state, accum, ok = apply_fn_box[0](
                    neco_params, opt_state, accum)
                n_opt_steps += 1
                if not bool(ok):
                    log_fn("gradient not valid")
            meter.update(float(loss))
            ir_meter.update(float(info["IR_neco"]))
        log_fn(f"epoch {epoch}: loss {meter.avg:.4f} IR_neco {ir_meter.avg:.3f}")
        write_history(epoch, "train",
                      {"loss": meter, "IR_neco": ir_meter}, n_opt_steps)

        select_loss = meter.avg
        if val_batches is not None:
            v_meter = AverageMeter()
            v_ir = AverageMeter()
            for batch in val_batches():
                v_loss, v_info = get_eval_step(batch)(neco_params,
                                                      *_batch_args(batch))
                v_meter.update(float(v_loss))
                v_ir.update(float(v_info["IR_neco"]))
            log_fn(f"epoch {epoch}: val loss {v_meter.avg:.4f} "
                   f"IR_neco {v_ir.avg:.3f}")
            write_history(epoch, "val",
                          {"loss": v_meter, "IR_neco": v_ir}, n_opt_steps)
            select_loss = v_meter.avg

        if select_loss < best:
            best = select_loss
            save_pytree(f"{cfg.snapshot_dir}/model_best_loss.npz", neco_params,
                        meta={"epoch": epoch, "loss": best})
        save_pytree(f"{cfg.snapshot_dir}/model_last.npz", neco_params,
                    meta={"epoch": epoch, "loss": meter.avg})
    return neco_params
