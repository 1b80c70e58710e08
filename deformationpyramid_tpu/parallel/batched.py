"""Pair-parallel (DP) and intra-pair (TP/SP) sharded execution.

TPU-native replacement for the reference's sequential pair loop
(``/root/reference/eval_nolearned.py:70``): a mega-batch of registration
problems is sharded over the mesh's data axis; within a shard pairs run as a
vmapped, convergence-masked while_loop. Metric aggregation is the workload's
only cross-device communication and rides ``psum`` over ICI.

For clouds too large for one chip's chamfer sweep, ``sharded_chamfer``
tiles the target points over the model axis (the "TP" analogue from
SURVEY.md §2.4): each shard computes a local streaming 1-NN min and the
global min reduces with ``pmin``-style collectives inside ``shard_map``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..solve.registration import SolverConfig, register_pair
from ..metrics.flow import metric_sums
from .mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array


def register_sharded(mesh: Mesh, cfg: SolverConfig):
    """Compile a mesh-sharded batched registration fn.

    Returns fn(keys [B,...], src [B,N,3], tgt [B,M,3], src_valid, tgt_valid)
    -> (warped [B,N,3], stats). B must divide by the data-axis size; the
    batch axis is sharded, everything else is per-pair local. Uses jit with
    sharding constraints (the idiomatic pjit path) so XLA lays out the
    per-pair solves with zero communication.
    """
    dsh = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())

    @functools.partial(jax.jit,
                       in_shardings=(dsh, dsh, dsh, dsh, dsh),
                       out_shardings=(dsh, dsh))
    def fn(keys, src, tgt, src_valid, tgt_valid):
        return jax.vmap(register_pair, in_axes=(0, 0, 0, None, 0, 0))(
            keys, src, tgt, cfg, src_valid, tgt_valid)

    return fn


def aggregate_metrics_sharded(mesh: Mesh):
    """psum-based metric aggregation across the data axis.

    fn(flow [B,N,3], flow_gt [B,N,3], mask [B,N]) -> dict of global sums.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
    )
    def fn(flow, flow_gt, mask):
        local = metric_sums(flow.reshape(-1, 3), flow_gt.reshape(-1, 3),
                            mask.reshape(-1))
        return jax.tree.map(
            lambda x: jax.lax.psum(x, (DATA_AXIS,)), local)

    return jax.jit(fn)


def neco_train_step_sharded(mesh: Mesh, matcher_params, lcfg):
    """Data-parallel NeCo training step: per-shard loss grads all-reduced
    with ``psum`` over the data axis — the canonical DP training collective
    (the per-pair registration itself needs none; the learned stack's
    training is where gradient all-reduce appears).

    Returns fn(neco_params, batch) -> (new_params, mean_loss) where batch is
    a dict of leading-batch-axis arrays: pyramid levels, coarse lengths,
    coarse_flow, gt_rot, gt_trn. neco_params are replicated.
    """
    from ..match.losses import neco_loss
    from ..match.outlier_rejection import apply_neco
    from ..match.pipeline import apply_matcher

    def pair_loss(neco_params, pyramid, s_len, t_len, cflow, rot, trn):
        data = apply_matcher(jax.lax.stop_gradient(matcher_params), pyramid,
                             s_len, t_len, lcfg.matcher)
        conf = apply_neco(neco_params, data["vec_6d"], data["vec_6d_mask"],
                          lcfg.neco)
        loss, _ = neco_loss(conf, data["vec_6d"], data["vec_6d_mask"],
                            data["vec_6d_ind"], data["s_pcd"], cflow, rot, trn)
        return loss

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(neco_params, batch):
        def shard_loss(p):
            losses = jax.vmap(pair_loss, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                p, batch["pyramid"], batch["src_len_c"], batch["tgt_len_c"],
                batch["coarse_flow"], batch["gt_rot"], batch["gt_trn"])
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(shard_loss)(neco_params)
        # gradient + loss all-reduce across the data axis
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g, DATA_AXIS), grads)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        new_params = jax.tree.map(lambda p, g: p - 1e-3 * g, neco_params, grads)
        return new_params, loss

    return jax.jit(step)


def sharded_nn_min(mesh: Mesh):
    """Intra-pair sharded 1-NN: target points split over the model axis.

    fn(x [N,3] replicated, y [M,3] sharded on M) -> sq_dist [N] global min.
    Demonstrates the TP/SP axis: each shard scans its y-slab with the local
    streaming min, then the global min reduces over ICI. The argmin variant
    carries (min, idx) pairs through the same reduction.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS)),
        out_specs=P(),
    )
    def fn(x, y):
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        y2 = jnp.sum(y * y, axis=-1)
        d = x2 + y2[None, :] - 2.0 * jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        local_min = jnp.min(d, axis=-1)
        return jax.lax.pmin(local_min, MODEL_AXIS)

    return jax.jit(fn)
