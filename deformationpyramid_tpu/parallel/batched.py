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
from typing import Any

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
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        local_min = jnp.min(d, axis=-1)
        return jax.lax.pmin(local_min, MODEL_AXIS)

    return jax.jit(fn)
