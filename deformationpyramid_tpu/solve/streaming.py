"""Continuous-batching (slot-refill) registration solver. **PARKED.**

Round-2 verdict (docs/PERFORMANCE.md): per-iteration cost is linear in
the batch width down to B=1, so asynchronously streamed B=1 ``register_pair``
programs have ZERO lockstep tail and strictly dominate this design on a
single chip (8.4 vs 1.2 pairs/s measured). Slot-refill only makes sense
when a single pair cannot saturate the chip (e.g. much wider MLPs); the
module is kept because its semantics are proven identical to the scan
solver (tests/test_streaming.py) and the state machinery is the base for
any future in-program batching.

The lockstep problem it was built for: a vmapped while_loop runs every
pair until the SLOWEST pair in the batch converges — measured ~40% wasted
iterations at B=16. Solver state lives in device buffers with a leading
slot axis; a jitted ``multi_step`` advances every active slot by k
iterations (done slots are masked no-ops); the host polls the tiny
``done`` flags, harvests finished pairs, and refills their slots with
fresh work.

Semantics per pair are IDENTICAL to ``solve/registration.py`` (same
early-stop rules, level transitions, Adam updates, level-carry quirk) — the
loop is just unrolled into explicit per-iteration state stepping:

  state: params [m,...] stacked, adam moments (per-level slices), current
  level, per-level iteration/plateau counters, active point set.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..models.pyramid import init_pyramid_params, level_params, level_warp, warp
from ..ops.chamfer import truncated_chamfer
from .registration import SolverConfig, _bce_zeros, _random_subset

Array = jax.Array

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


def init_pair_state(key: Array, src: Array, tgt: Array, cfg: SolverConfig,
                    src_valid: Array | None = None,
                    tgt_valid: Array | None = None) -> dict[str, Any]:
    """Build one pair's solver state (mirrors register_pair's preamble)."""
    pcfg = cfg.pyramid
    n_src, n_tgt = src.shape[0], tgt.shape[0]
    if src_valid is None:
        src_valid = jnp.ones((n_src,), bool)
    if tgt_valid is None:
        tgt_valid = jnp.ones((n_tgt,), bool)
    k_init, k_src, k_tgt = jax.random.split(key, 3)
    params = init_pyramid_params(k_init, pcfg)
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
    zeros_like_params = jax.tree.map(jnp.zeros_like, params)
    return {
        "params": params,
        "adam_m": zeros_like_params,
        "adam_v": zeros_like_params,
        "adam_t": jnp.int32(0),
        "pts": s_sample,
        "pts_valid": s_valid,
        "t_sample": t_sample,
        "t_valid": t_valid,
        "level": jnp.int32(0),
        "loss_prev": jnp.float32(1e6),
        "counter": jnp.int32(0),
        "it": jnp.int32(0),
        "done": jnp.bool_(False),
        "loss": jnp.float32(jnp.inf),
        "total_iters": jnp.int32(0),
        "src_c": src_c,
        "src_valid": src_valid,
        "tgt_mean": tgt_mean[0],
    }


def _pair_step(state: dict[str, Any], cfg: SolverConfig) -> dict[str, Any]:
    """One solver iteration for one pair (no-op when done)."""
    pcfg = cfg.pyramid
    lvl = state["level"]
    lvl_p = level_params(state["params"], lvl)

    def loss_fn(p):
        warped, nr = level_warp(p, state["pts"], lvl, pcfg)
        loss = truncated_chamfer(warped, state["t_sample"],
                                 x_valid=state["pts_valid"],
                                 y_valid=state["t_valid"], trunc=1e9,
                                 use_pallas=cfg.use_pallas)
        if cfg.w_reg > 0:
            reg = _bce_zeros(nr, state["pts_valid"])
            loss = loss + jnp.where(lvl > 0, cfg.w_reg * reg, 0.0)
        return loss, warped

    (loss, warped), grads = jax.value_and_grad(loss_fn, has_aux=True)(lvl_p)

    small = loss < cfg.loss_eps
    plateau = jnp.abs(state["loss_prev"] - loss) < state["loss_prev"] * cfg.break_threshold_ratio
    counter = state["counter"] + plateau.astype(jnp.int32)
    stop = small | (counter >= cfg.max_break_count)
    apply_upd = jnp.logical_not(stop)

    # manual Adam on the active level's slice
    t_new = state["adam_t"] + 1
    b1t = 1.0 - ADAM_B1 ** t_new.astype(jnp.float32)
    b2t = 1.0 - ADAM_B2 ** t_new.astype(jnp.float32)

    def slice_at(tree_all):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, lvl, 0, keepdims=False),
            tree_all)

    def put_at(tree_all, tree_lvl):
        return jax.tree.map(
            lambda a, x: jax.lax.dynamic_update_index_in_dim(a, x, lvl, 0),
            tree_all, tree_lvl)

    p_l = slice_at(state["params"])
    m_l = slice_at(state["adam_m"])
    v_l = slice_at(state["adam_v"])
    m2 = jax.tree.map(lambda m, g: ADAM_B1 * m + (1 - ADAM_B1) * g, m_l, grads)
    v2 = jax.tree.map(lambda v, g: ADAM_B2 * v + (1 - ADAM_B2) * g * g, v_l, grads)
    p2 = jax.tree.map(
        lambda p, m, v: jnp.where(
            apply_upd,
            p - cfg.lr * (m / b1t) / (jnp.sqrt(v / b2t) + ADAM_EPS), p),
        p_l, m2, v2)
    m2 = jax.tree.map(lambda new, old: jnp.where(apply_upd, new, old), m2, m_l)
    v2 = jax.tree.map(lambda new, old: jnp.where(apply_upd, new, old), v2, v_l)
    params2 = put_at(state["params"], p2)
    adam_m2 = put_at(state["adam_m"], m2)
    adam_v2 = put_at(state["adam_v"], v2)

    it2 = state["it"] + 1
    level_done = stop | (it2 >= cfg.iters)
    is_last = lvl >= (pcfg.m - 1)
    done2 = level_done & is_last

    # level transition: next level consumes this eval's warp; counters reset
    new_level = jnp.where(level_done & jnp.logical_not(is_last), lvl + 1, lvl)
    new_pts = jnp.where(level_done, warped, state["pts"])
    new_it = jnp.where(level_done, 0, it2)
    new_counter = jnp.where(level_done, 0, counter)
    new_loss_prev = jnp.where(level_done, 1e6,
                              jnp.where(stop, state["loss_prev"], loss))
    new_adam_t = jnp.where(level_done, 0, jnp.where(apply_upd, t_new,
                                                    state["adam_t"]))

    new_state = dict(state)
    new_state.update({
        "params": params2, "adam_m": adam_m2, "adam_v": adam_v2,
        "adam_t": new_adam_t, "pts": new_pts, "level": new_level,
        "loss_prev": new_loss_prev, "counter": new_counter, "it": new_it,
        "done": state["done"] | done2, "loss": loss,
        "total_iters": state["total_iters"] + 1,
    })
    # freeze everything once done (mask whole-state update)
    frozen = state["done"]
    return jax.tree.map(lambda new, old: jnp.where(frozen, old, new),
                        new_state, state)


def make_stream_fns(cfg: SolverConfig, k_inner: int = 50):
    """Build the jitted (multi_step, refill, harvest) functions.

    multi_step(state_B) -> state_B      advance every active slot k_inner iters
    refill(state_B, slot, pair_state)   overwrite one slot
    harvest(state_B, slot) -> warped    final full-cloud warp of one slot
    """

    def one(state):
        def body(_, s):
            return _pair_step(s, cfg)
        return jax.lax.fori_loop(0, k_inner, body, state)

    multi_step = jax.jit(jax.vmap(one))

    @jax.jit
    def refill(state_b, slot, pair_state):
        return jax.tree.map(
            lambda b, p: jax.lax.dynamic_update_index_in_dim(b, p, slot, 0),
            state_b, pair_state)

    @jax.jit
    def harvest(state_b, slot):
        s = jax.tree.map(
            lambda b: jax.lax.dynamic_index_in_dim(b, slot, 0, keepdims=False),
            state_b)
        warped, _ = warp(s["params"], s["src_c"], cfg.pyramid)
        return warped + s["tgt_mean"][None], s["total_iters"]

    init_one = jax.jit(lambda key, src, tgt: init_pair_state(key, src, tgt, cfg))
    return multi_step, refill, harvest, init_one


def register_stream(pairs, cfg: SolverConfig, n_slots: int = 4,
                    k_inner: int = 50, key: Array | None = None):
    """Solve a list of (src, tgt) pairs with continuous batching.

    pairs: list of (src [N,3], tgt [M,3]) numpy/jnp arrays, all same shape.
    Returns list of warped clouds in input order. Throughput-oriented: no
    idle lockstep tail — finished slots refill immediately.
    """
    import numpy as np

    key = key if key is not None else jax.random.key(0)
    multi_step, refill, harvest, init_one = make_stream_fns(cfg, k_inner)

    n = len(pairs)
    results: list = [None] * n
    next_idx = 0
    slot_to_pair = {}

    # prime the slots
    first_states = []
    for s in range(min(n_slots, n)):
        key, sub = jax.random.split(key)
        first_states.append(init_one(sub, jnp.asarray(pairs[s][0]),
                                     jnp.asarray(pairs[s][1])))
        slot_to_pair[s] = s
        next_idx = s + 1
    state_b = jax.tree.map(lambda *xs: jnp.stack(xs), *first_states)
    active = len(first_states)

    # Pipelined dispatch: keep the NEXT multi_step enqueued while the host
    # inspects the previous step's done flags — otherwise the device idles
    # for a full host round-trip between steps (ruinous over a remote
    # tunnel). A finished slot runs at most one extra masked k_inner block
    # before its refill lands; done slots are frozen no-ops, so results are
    # unaffected.
    state_ahead = multi_step(state_b)
    while active > 0:
        state_next = multi_step(state_ahead)            # enqueue ahead
        done_flags = np.asarray(state_ahead["done"])    # sync the older step
        for slot, pair_idx in list(slot_to_pair.items()):
            if not done_flags[slot]:
                continue
            warped, iters = harvest(state_ahead, slot)
            results[pair_idx] = np.asarray(warped)
            del slot_to_pair[slot]
            active -= 1
            if next_idx < n:
                key, sub = jax.random.split(key)
                ps = init_one(sub, jnp.asarray(pairs[next_idx][0]),
                              jnp.asarray(pairs[next_idx][1]))
                state_next = refill(state_next, slot, ps)
                slot_to_pair[slot] = next_idx
                next_idx += 1
                active += 1
        state_ahead = state_next
    return results
