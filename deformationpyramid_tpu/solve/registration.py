"""Per-pair test-time-optimization registration engine, fully compiled.

Re-design of the reference ``Registration.optimize_deformation_pyramid``
(``/root/reference/model/registration.py:126-262``). The reference runs a
Python loop with a host sync (``loss.item()``) every iteration; here the
ENTIRE registration — m sequential levels, each a fresh-Adam inner loop with
3-way early stopping — compiles into one XLA program:

* inner loop  -> ``lax.while_loop`` carrying (params, opt state, plateau
  counter, prev loss, last warped points),
* level loop  -> ``lax.scan`` over the stacked level parameters,
* batching    -> ``jax.vmap`` (the while_loop batching rule yields per-pair
  convergence masks automatically: a pair that converged early stops paying
  compute-updates while laggards finish).

Early-stop semantics preserved exactly (``registration.py:226-232``):
  1. loss < loss_eps (1e-4)                                  -> break, no step
  2. |loss_prev - loss| < loss_prev * break_threshold_ratio  -> counter += 1
  3. counter >= max_break_count                              -> break, no step
and the points handed to the next level are the warp evaluated *before* the
final optimizer step of the level (the reference breaks/ends after evaluating
but before stepping — ``registration.py:241-249``).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp

from ..models.pyramid import (
    NDPConfig, init_pyramid_params, level_warp, level_warp_t, warp,
)
from .loop import LoopConfig, run_adam_loop
from ..ops.chamfer import truncated_chamfer
from ..ops.chamfer_fused import chamfer_l1_fused
from ..ops.fused_level import (
    fused_level_warp, fused_level_warp_t, supports_fused,
)
from ..ops.fused_iteration import (run_fused_level, run_fused_level_ldmk,
                                   supports_fused_iteration,
                                   supports_fused_iteration_ldmk)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Reference ``config/NDP.yaml`` knobs + pyramid config."""

    pyramid: NDPConfig = dataclasses.field(default_factory=NDPConfig)
    iters: int = 500
    lr: float = 0.01
    max_break_count: int = 15
    break_threshold_ratio: float = 0.001
    samples: int = 2000
    w_reg: float = 0.0
    w_ldmk: float = 0.0
    w_cd: float = 0.0        # chamfer weight in landmark mode
    trunc_cd: float = 0.25   # chamfer truncation in landmark mode (squared)
    # Pure-chamfer-mode truncation. The reference hardcodes trunc=1e9 for
    # the no-landmark objective (``model/registration.py:212``) — the
    # truncation mechanism designed for partial overlap is only ever used
    # on the landmark+chamfer branch (``:195``). Overriding this (e.g.
    # 0.25, the LNDP trunc_cd) gives plain NDP its best shot on occluded
    # suites — the skeptic's control for the learned-stack headline.
    trunc_chamfer: float = 1e9
    loss_eps: float = 1e-4
    use_pallas: bool | None = None  # None = auto-detect TPU backend
    # Measured-neutral/negative fusion experiments, kept strictly OPT-IN
    # (docs/PERFORMANCE.md round-2 findings 0b and 2): None/False = off.
    use_fused: bool | None = None  # fused level-warp kernels (opt-in)
    use_fused_chamfer: bool | None = None  # one-kernel chamfer loss (opt-in)
    # [3, N] layout for the level-warp compute chain — measured EXACTLY
    # NEUTRAL on the real chip (bench median 7.07 vs 7.08 pairs/s, same
    # 0.112 ms/iter, identical iteration counts; docs/PERFORMANCE.md
    # round-3 parking entry: XLA's layout assignment already handles the
    # [N, 3] minor-dim padding the hypothesis blamed). Opt-in like the
    # other measured-neutral experiments: None/False = off.
    transposed: bool | None = None
    # Two-kernel fused iteration (ops/fused_iteration.py): warp fwd +
    # dual sweep in one Pallas launch, O(N) XLA glue, vjp bwd + Adam in a
    # second launch. Chamfer-mode SE3+axis_angle only; None/False = off.
    use_fused_iteration: bool | None = None
    # ONE-kernel pure-landmark iteration (w_cd == 0). Measured SLOWER than
    # the unfused compiled loop on-chip (0.0791 vs 0.0658 ms/iter at 256
    # rows, scripts/ab_ldmk_iteration.py — inside one while_loop there are
    # no dispatches to save and XLA fuses the tiny chain as well as the
    # hand kernel without its per-launch params+moments VMEM round trip),
    # so it needs this explicit opt-in on top of use_fused_iteration
    # (None = DP_FUSED_LDMK env, default off).
    use_fused_ldmk: bool | None = None
    # Temporal-coherence sweep reuse: T >= 2 runs one exact dual sweep
    # per T iterations; the in-between iterations re-warp and walk the
    # association on precomputed KNN graphs with a drift-bound hold
    # (ops/fused_iteration.run_fused_level docstring). None = the
    # DP_SWEEP_REUSE env (default 0 = exact sweep every iteration).
    sweep_reuse: int | None = None


def _bce_zeros(p: Array, valid: Array | None = None) -> Array:
    """BCE(p, target=0) = -mean(log(1-p)), torch-style -100 clamp."""
    log1mp = jnp.maximum(jnp.log1p(-p), -100.0)
    if valid is None:
        return -jnp.mean(log1mp)
    return -jnp.sum(jnp.where(valid, log1mp, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


def _solve_level(lvl_params: dict, lvl: Array, pts: Array, pts_valid: Array,
                 t_sample: Array, t_valid: Array, n_ldmk: int,
                 tgt_ldmk: Array | None, ldmk_valid: Array | None,
                 cfg: SolverConfig) -> tuple[dict, Array, dict[str, Array]]:
    """Adam-optimize one pyramid level on ``pts`` (sampled source points).

    In landmark mode ``pts`` is [ldmk ; sample] (reference
    ``registration.py:187-203``); ``n_ldmk`` is the static padded landmark
    count (0 = pure chamfer mode).

    Returns (updated level params, warped pts from last evaluation, stats).
    """
    pcfg = cfg.pyramid
    if bool(cfg.use_fused_iteration):
        lcfg = LoopConfig(iters=cfg.iters, lr=cfg.lr,
                          max_break_count=cfg.max_break_count,
                          break_threshold_ratio=cfg.break_threshold_ratio,
                          loss_eps=cfg.loss_eps)
        if supports_fused_iteration(pcfg, cfg.w_reg, n_ldmk):
            return run_fused_level(lvl_params, pts, pts_valid, t_sample,
                                   t_valid, lvl, pcfg, lcfg,
                                   trunc=cfg.trunc_chamfer,
                                   w_reg=cfg.w_reg,
                                   resweep_every=cfg.sweep_reuse)
        if supports_fused_iteration_ldmk(pcfg, cfg.w_reg, n_ldmk, cfg.w_cd):
            if cfg.w_cd == 0:
                # w_cd == 0 => pts IS the landmark rows (register_pair).
                # One-kernel path is opt-in (loses to the unfused compiled
                # loop on-chip — see use_fused_ldmk); otherwise fall
                # through to the unfused loop below.
                fused_ldmk = cfg.use_fused_ldmk
                if fused_ldmk is None:
                    fused_ldmk = os.environ.get("DP_FUSED_LDMK") == "1"
                if fused_ldmk:
                    return run_fused_level_ldmk(lvl_params, pts, ldmk_valid,
                                                tgt_ldmk, lvl, pcfg, lcfg)
            else:
                # landmark + chamfer: pts = [ldmk ; sample], trunc chamfer
                return run_fused_level(lvl_params, pts, pts_valid, t_sample,
                                       t_valid, lvl, pcfg, lcfg,
                                       trunc=cfg.trunc_cd, n_ldmk=n_ldmk,
                                       tgt_ldmk=tgt_ldmk,
                                       ldmk_valid=ldmk_valid, w_cd=cfg.w_cd,
                                       resweep_every=cfg.sweep_reuse)
    # Fused level-warp kernels are opt-in: the A/B on the tunneled v5e chip
    # measured 0.397 (fused) vs 0.377 (unfused) ms/iteration at B=4 — the
    # kernel boundaries trade ~1:1 against XLA's own fusion here because
    # every [N, 3] tensor pads to 128 lanes inside the kernel. Kept for
    # experimentation and as the base of the fully-fused iteration kernel.
    fused = bool(cfg.use_fused) and supports_fused(pcfg) and cfg.w_reg == 0
    # transposed + fused => the [3, N]-internal kernel: N on the lane axis
    # inside the kernel, so the Rodrigues/posenc chain runs at 3/8-sublane
    # utilization instead of 3/128-lane (the untransposed kernel's flaw)
    fused_t = fused and bool(cfg.transposed)
    fused = fused and not fused_t
    fused_cd = bool(cfg.use_fused_chamfer)
    use_t = (bool(cfg.transposed) and not pcfg.nonrigidity_est
             and not fused and not fused_t)

    def chamfer(wx, wv):
        """Truncated chamfer vs the fixed target sample; the fused kernel
        folds loss + scatter-gradient into one sweep (grad wrt wx only —
        t_sample is constant here, reference registration.py:205-216)."""
        trunc = cfg.trunc_chamfer if n_ldmk == 0 else cfg.trunc_cd
        if fused_cd:
            return chamfer_l1_fused(wx, t_sample, x_valid=wv, y_valid=t_valid,
                                    trunc=trunc)
        return truncated_chamfer(wx, t_sample, x_valid=wv, y_valid=t_valid,
                                 trunc=trunc, use_pallas=cfg.use_pallas)

    pts_t = pts.T if (use_t or fused_t) else None

    def loss_fn(p):
        if fused_t:
            warped, nr = fused_level_warp_t(p, pts_t, lvl, pcfg).T, None
        elif use_t:
            # [3, N] compute chain; one transpose back for the chamfer
            # kernel + row slicing (same math, full VPU tiles)
            warped, nr = level_warp_t(p, pts_t, lvl, pcfg).T, None
        elif fused:
            warped, nr = fused_level_warp(p, pts, lvl, pcfg), None
        else:
            warped, nr = level_warp(p, pts, lvl, pcfg)
        if n_ldmk > 0:
            w_ldmk = warped[:n_ldmk]
            sq = jnp.sum((w_ldmk - tgt_ldmk) ** 2, axis=-1)
            loss = jnp.sum(jnp.where(ldmk_valid, sq, 0.0)) / jnp.maximum(
                jnp.sum(ldmk_valid), 1)
            if cfg.w_cd > 0:
                loss = loss + cfg.w_cd * chamfer(warped[n_ldmk:],
                                                 pts_valid[n_ldmk:])
        else:
            loss = chamfer(warped, pts_valid)
        if cfg.w_reg > 0:
            reg = _bce_zeros(nr, pts_valid)
            loss = loss + jnp.where(lvl > 0, cfg.w_reg * reg, 0.0)
        return loss, warped

    lcfg = LoopConfig(iters=cfg.iters, lr=cfg.lr,
                      max_break_count=cfg.max_break_count,
                      break_threshold_ratio=cfg.break_threshold_ratio,
                      loss_eps=cfg.loss_eps)
    new_params, warped, stats = run_adam_loop(
        lambda p, it, k: loss_fn(p), lvl_params, lcfg, aux_init=pts)
    return new_params, warped, stats


def _random_subset(key: Array, pts: Array, valid: Array, k: int) -> tuple[Array, Array]:
    """Random k-subset of the valid rows (jit-safe, fixed output shape).

    Equivalent to the reference's ``randperm[:k]`` (``registration.py:156-159``)
    generalized to padded clouds: rank rows by random score with invalid rows
    pushed last; if fewer than k valid rows exist the extras are masked out.
    """
    n = pts.shape[0]
    score = jax.random.uniform(key, (n,))
    score = jnp.where(valid, score, 2.0)
    _, idx = jax.lax.top_k(-score, k)
    return pts[idx], valid[idx]


def _random_subset_idx(key: Array, pts: Array, valid: Array, k: int):
    """Like :func:`_random_subset` but also returns the chosen indices."""
    n = pts.shape[0]
    score = jax.random.uniform(key, (n,))
    score = jnp.where(valid, score, 2.0)
    _, idx = jax.lax.top_k(-score, k)
    return pts[idx], valid[idx], idx


def optimize_pyramid(k_init: Array, pts0: Array, pts_valid: Array,
                     t_sample: Array, t_valid: Array, cfg: SolverConfig,
                     n_ldmk: int = 0, tgt_ldmk: Array | None = None,
                     ldmk_valid: Array | None = None,
                     ) -> tuple[dict, dict[str, Array]]:
    """Level-by-level Adam on pre-centered, pre-sampled points.

    This is the fixed-shape core of the registration: inputs are the
    ``samples``-sized source/target subsets (already mean-centered), so one
    compiled program serves EVERY pair in a sweep regardless of original
    cloud size. The full-cloud warp (one forward pass, not 4500 iterations)
    is applied separately at bucketed shapes — see
    ``cli/eval_nolearned.py``. Returns (final stacked level params, stats).

    Reference: the level loop of ``optimize_deformation_pyramid``
    (``/root/reference/model/registration.py:166-249``).
    """
    params = init_pyramid_params(k_init, cfg.pyramid)

    def level_step(pts, inp):
        lvl_p, lvl = inp
        new_p, warped, stats = _solve_level(
            lvl_p, lvl, pts, pts_valid, t_sample, t_valid,
            n_ldmk, tgt_ldmk, ldmk_valid, cfg)
        return warped, (new_p, stats)

    levels = jnp.arange(cfg.pyramid.m)
    _, (final_params, stats) = jax.lax.scan(level_step, pts0, (params, levels))
    return final_params, stats


def register_pair(key: Array, src: Array, tgt: Array, cfg: SolverConfig,
                  src_valid: Array | None = None, tgt_valid: Array | None = None,
                  src_ldmk: Array | None = None, tgt_ldmk: Array | None = None,
                  ldmk_valid: Array | None = None,
                  ) -> tuple[Array, dict[str, Array]]:
    """Register one (padded) pair; returns (warped full source cloud, stats).

    Pipeline parity with ``optimize_deformation_pyramid``:
    mean-center both clouds -> random ``samples``-subset -> level-by-level
    Adam -> final full-cloud warp through all levels -> re-add target mean.
    """
    pcfg = cfg.pyramid
    n_src, n_tgt = src.shape[0], tgt.shape[0]
    if src_valid is None:
        src_valid = jnp.ones((n_src,), bool)
    if tgt_valid is None:
        tgt_valid = jnp.ones((n_tgt,), bool)

    k_init, k_src, k_tgt = jax.random.split(key, 3)

    # Cancel global translation (masked means over real points).
    src_mean = (jnp.sum(jnp.where(src_valid[:, None], src, 0.0), axis=0)
                / jnp.maximum(jnp.sum(src_valid), 1))[None]
    tgt_mean = (jnp.sum(jnp.where(tgt_valid[:, None], tgt, 0.0), axis=0)
                / jnp.maximum(jnp.sum(tgt_valid), 1))[None]
    src_c = src - src_mean
    tgt_c = tgt - tgt_mean

    k = min(cfg.samples, n_src)
    kt = min(cfg.samples, n_tgt)
    s_sample, s_valid = _random_subset(k_src, src_c, src_valid, k)
    t_sample, t_valid = _random_subset(k_tgt, tgt_c, tgt_valid, kt)

    use_ldmk = src_ldmk is not None
    if use_ldmk:
        n_ldmk = src_ldmk.shape[0]
        if ldmk_valid is None:
            ldmk_valid = jnp.ones((n_ldmk,), bool)
        src_ldmk_c = src_ldmk - src_mean
        tgt_ldmk_c = tgt_ldmk - tgt_mean
        if cfg.w_cd > 0:
            pts0 = jnp.concatenate([src_ldmk_c, s_sample])
            pts_valid = jnp.concatenate([ldmk_valid, s_valid])
        else:
            pts0, pts_valid = src_ldmk_c, ldmk_valid
    else:
        n_ldmk = 0
        pts0, pts_valid = s_sample, s_valid
        tgt_ldmk_c = None

    final_params, stats = optimize_pyramid(
        k_init, pts0, pts_valid, t_sample, t_valid, cfg,
        n_ldmk=n_ldmk, tgt_ldmk=tgt_ldmk_c, ldmk_valid=ldmk_valid)

    warped_full, _ = warp(final_params, src_c, pcfg)
    warped_full = warped_full + tgt_mean
    return warped_full, stats


def make_register_fn(cfg: SolverConfig, landmarks: bool = False):
    """Build a jitted single-pair registration fn (one compile per shape)."""
    if landmarks:
        def fn(key, src, tgt, src_ldmk, tgt_ldmk, ldmk_valid,
               src_valid=None, tgt_valid=None):
            return register_pair(key, src, tgt, cfg, src_valid, tgt_valid,
                                 src_ldmk, tgt_ldmk, ldmk_valid)
    else:
        def fn(key, src, tgt, src_valid=None, tgt_valid=None):
            return register_pair(key, src, tgt, cfg, src_valid, tgt_valid)
    return jax.jit(fn)


def register_batch(keys: Array, src: Array, tgt: Array, cfg: SolverConfig,
                   src_valid: Array | None = None,
                   tgt_valid: Array | None = None) -> tuple[Array, dict[str, Array]]:
    """vmap over pairs: keys [B, 2], src [B, N, 3], tgt [B, M, 3].

    This is the workload's data-parallel axis (SURVEY.md §2.4): the batched
    while_loop runs until every pair in the batch converged, with converged
    pairs masked. Shard the batch axis over a mesh via
    ``parallel.batched.register_sharded``.
    """
    b = src.shape[0]
    if src_valid is None:
        src_valid = jnp.ones(src.shape[:2], bool)
    if tgt_valid is None:
        tgt_valid = jnp.ones(tgt.shape[:2], bool)
    fn = jax.vmap(register_pair, in_axes=(0, 0, 0, None, 0, 0))
    return fn(keys, src, tgt, cfg, src_valid, tgt_valid)
