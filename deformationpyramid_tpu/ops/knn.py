"""Nearest-neighbor ops: tiled Pallas 1-NN and pure-XLA fallbacks.

This replaces the reference's pytorch3d ``knn_points`` CUDA kernel
(``/root/reference/model/loss.py:4,177-181``) with TPU-native code. The key
design decision: the hot path (Chamfer inside the per-pair Adam loop) only
needs the *index* of the nearest neighbor — the differentiable distance is
recomputed from gathered points (see ``ops/chamfer.py``). So the N x M sweep
is a pure integer-output kernel with no VJP, and fwd+bwd of the loss are O(N).

The Pallas kernel streams tiles of the (N, M) squared-distance matrix through
VMEM with a running (min, argmin) carry — flash-attention-style streaming min,
never materializing N^2 in HBM.

PRECISION IS LOAD-BEARING: every distance matmul runs at
``Precision.HIGHEST``. The TPU MXU's default bf16 pass puts ~1e-3 absolute
noise on ``x.y``, which flips argmin choices once true NN distances drop
below ~1e-3 — the solver's chamfer loss then floors at sqrt(1e-3) ~= 0.03
instead of the f32 floor ~3e-4, breaking convergence parity with the
reference (measured round 2: near-zero chamfer 0.0298 default vs 0.0003
HIGHEST). K=3, so the extra matmul passes cost nothing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; keep module importable on CPU.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

Array = jax.Array

_BIG = 3.0e38  # python float: safe to close over inside pallas kernels


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Pure-XLA reference / fallback
# ---------------------------------------------------------------------------

def nn_argmin_xla(x: Array, y: Array, y_valid: Array | None = None) -> tuple[Array, Array]:
    """1-NN of each row of ``x`` [N, D] in ``y`` [M, D].

    Returns (sq_dist [N], idx [N]). ``y_valid`` optionally masks padded rows
    of ``y`` out of the search (True = valid).
    """
    # ||x - y||^2 = |x|^2 + |y|^2 - 2 x.y ; the matmul rides the MXU.
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # [N, 1]
    y2 = jnp.sum(y * y, axis=-1)  # [M]
    d = x2 + y2[None, :] - 2.0 * jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if y_valid is not None:
        d = jnp.where(y_valid[None, :], d, _BIG)
    idx = jnp.argmin(d, axis=-1)
    sq = jnp.take_along_axis(d, idx[:, None], axis=-1)[:, 0]
    # Exact-zero clamp: cancellation can leave tiny negatives.
    return jnp.maximum(sq, 0.0), idx


# ---------------------------------------------------------------------------
# Pallas streaming kernel
# ---------------------------------------------------------------------------

def _nn_kernel(x_ref, y_ref, y2_ref, dist_ref, idx_ref, *, tm: int, m_pad: int):
    """One x-tile vs all y-tiles with a running (min, argmin) carry.

    x_ref: [TN, D] VMEM tile of queries.
    y_ref: [M_pad, D] full database in VMEM (point clouds are small: 30k x 3
        f32 = 360 KB, far under the ~16 MB VMEM budget).
    y2_ref: [1, M_pad] precomputed squared norms; padded entries hold +BIG so
        padded rows never win the min.
    """
    x = x_ref[:]  # [TN, D]
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # [TN, 1]
    n_tiles = m_pad // tm

    def body(j, carry):
        best_d, best_i = carry  # [TN, 1] each
        y_tile = y_ref[pl.ds(j * tm, tm), :]  # [TM, D]
        y2_tile = y2_ref[0, pl.ds(j * tm, tm)]  # [TM]
        # [TN, TM] tile of squared distances (MXU matmul + VPU adds).
        d = x2 + y2_tile[None, :] - 2.0 * jax.lax.dot_general(
            x, y_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        tile_min = jnp.min(d, axis=-1, keepdims=True)  # [TN, 1]
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * tm
        tile_arg = jnp.min(
            jnp.where(d <= tile_min, cols, jnp.int32(2**30)),
            axis=-1,
            keepdims=True,
        )
        better = tile_min < best_d
        return jnp.where(better, tile_min, best_d), jnp.where(better, tile_arg, best_i)

    tn = x.shape[0]
    init = (jnp.full((tn, 1), _BIG, jnp.float32), jnp.zeros((tn, 1), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    dist_ref[:] = jnp.maximum(best_d, 0.0)
    idx_ref[:] = best_i


@functools.partial(jax.jit, static_argnames=("tn", "tm"))
def _nn_argmin_pallas_padded(x_pad: Array, y_pad: Array, y2_pad: Array,
                             tn: int = 256, tm: int = 512) -> tuple[Array, Array]:
    n_pad, d = x_pad.shape
    m_pad = y_pad.shape[0]
    kernel = functools.partial(_nn_kernel, tm=tm, m_pad=m_pad)
    grid = (n_pad // tn,)
    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * (d + 2),
            bytes_accessed=(n_pad * d + m_pad * d + 2 * n_pad) * 4,
            transcendentals=0,
        ),
    )(x_pad, y_pad, y2_pad)
    return dist[:, 0], idx[:, 0]


def nn_argmin_pallas(x: Array, y: Array, y_valid: Array | None = None,
                     tn: int = 256, tm: int = 512) -> tuple[Array, Array]:
    """Pallas-backed 1-NN. Same contract as :func:`nn_argmin_xla`."""
    n, d = x.shape
    m = y.shape[0]
    n_pad = _round_up(max(n, tn), tn)
    m_pad = _round_up(max(m, tm), tm)
    x_pad = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(x.astype(jnp.float32))
    y_pad = jnp.zeros((m_pad, d), jnp.float32).at[:m].set(y.astype(jnp.float32))
    y2 = jnp.sum(y_pad * y_pad, axis=-1)
    valid = jnp.arange(m_pad) < m
    if y_valid is not None:
        valid = valid & jnp.pad(y_valid, (0, m_pad - m), constant_values=False)
    y2 = jnp.where(valid, y2, _BIG)[None, :]
    dist, idx = _nn_argmin_pallas_padded(x_pad, y_pad, y2, tn=tn, tm=tm)
    return dist[:n], idx[:n]


def _nn_dual_kernel(x_ref, y_ref, x2_ref, y2_ref,
                    rdist_ref, ridx_ref, cdist_ref, cidx_ref,
                    cmin_scr, carg_scr, *, tn: int, tm: int, m_pad: int,
                    elementwise: bool):
    """One x-tile vs y (tiled): row (x->y) min/argmin written per x-tile,
    column (y->x) running min/argmin accumulated in VMEM scratch across the
    sequential TPU grid, flushed at the last x-tile.

    The distance block is computed per (x-tile, y-tile) so VMEM holds at
    most [tn, tm] floats regardless of cloud size (30k-point clouds are a
    [512, 30720] = 63 MB block without inner tiling — over budget).
    x2/y2 carry +BIG at padded/invalid rows so they never win either min.
    ``elementwise=True`` computes distances as three broadcast FMA passes on
    the VPU instead of a K=3 matmul (the MXU is badly utilized at K=3).
    """
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    x = x_ref[:]                    # [TN, D]
    x2 = x2_ref[0, :]               # [TN]
    n_ytiles = m_pad // tm
    first_x = i == 0

    def ybody(j, carry):
        best_d, best_i = carry      # [TN, 1] row running min/arg
        y_t = y_ref[pl.ds(j * tm, tm), :]          # [TM, D]
        y2_t = y2_ref[0, pl.ds(j * tm, tm)]        # [TM]
        if elementwise:
            d = x2[:, None] + y2_t[None, :] - 2.0 * (
                x[:, 0:1] * y_t[:, 0][None, :]
                + x[:, 1:2] * y_t[:, 1][None, :]
                + x[:, 2:3] * y_t[:, 2][None, :])
        else:
            d = x2[:, None] + y2_t[None, :] - 2.0 * jax.lax.dot_general(
                x, y_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        # rows: fold this y-tile into the x-tile's running minima
        tile_rmin = jnp.min(d, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * tm
        tile_rarg = jnp.min(jnp.where(d <= tile_rmin, cols, jnp.int32(2**30)),
                            axis=1, keepdims=True)
        rbetter = tile_rmin < best_d
        best_d = jnp.where(rbetter, tile_rmin, best_d)
        best_i = jnp.where(rbetter, tile_rarg, best_i)

        # columns: fold this x-tile into the global y->x scratch slice
        tile_cmin = jnp.min(d, axis=0)                   # [TM]
        rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + i * tn
        tile_carg = jnp.min(jnp.where(d <= tile_cmin[None, :], rows,
                                      jnp.int32(2**30)), axis=0)
        prev_min = cmin_scr[0, pl.ds(j * tm, tm)]
        prev_arg = carg_scr[0, pl.ds(j * tm, tm)]
        cbetter = first_x | (tile_cmin < prev_min)
        cmin_scr[0, pl.ds(j * tm, tm)] = jnp.where(cbetter, tile_cmin, prev_min)
        carg_scr[0, pl.ds(j * tm, tm)] = jnp.where(cbetter, tile_carg, prev_arg)
        return best_d, best_i

    init = (jnp.full((tn, 1), _BIG, jnp.float32),
            jnp.zeros((tn, 1), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_ytiles, ybody, init)
    rdist_ref[:] = jnp.maximum(best_d, 0.0)
    ridx_ref[:] = best_i

    @pl.when(i == n_tiles - 1)
    def _():
        cdist_ref[0, :] = jnp.maximum(cmin_scr[0, :], 0.0)
        cidx_ref[0, :] = carg_scr[0, :]


def _nn_dual_kernel_v2(x_ref, x2_ref, yr_ref, y2_ref,
                       rdist_ref, ridx_ref, cdist_ref, cidx_ref,
                       cmin_scr, carg_scr, *, tn: int, tm: int, m_pad: int):
    """Transpose-free layout variant of :func:`_nn_dual_kernel`.

    Same math and outputs, but the operand layouts are chosen so no value
    crosses the lane/sublane axis inside the kernel:

    * ``x`` stays [TN, 3]: each coordinate column ``x[:, k:k+1]`` is already
      sublane-major, so broadcasting it across the tm lanes of the distance
      block is a free lane-splat.
    * ``x2`` arrives as a COLUMN [TN, 1] (the v1 kernel took a lane-major
      [1, TN] row and paid a lane->sublane transpose per tile to broadcast
      it down the block's rows).
    * ``y`` arrives as coordinate ROWS [3, M_pad] (pre-transposed once
      outside — loop-invariant for the solver, so XLA hoists it), so
      ``yr[k, ds]`` is a lane-major row vector; the v1 kernel sliced
      columns out of [M_pad, 3], a strided sublane->lane gather.

    The distance block is then 3 outer-product FMAs plus two broadcast
    adds — pure VPU passes, no shuffles.
    """
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    x2 = x2_ref[:]                  # [TN, 1] column (+BIG at invalid rows)
    x0 = x_ref[:, 0:1]
    x1 = x_ref[:, 1:2]
    xz = x_ref[:, 2:3]
    n_ytiles = m_pad // tm
    first_x = i == 0

    def ybody(j, carry):
        best_d, best_i = carry      # [TN, 1] row running min/arg
        y0 = yr_ref[0, pl.ds(j * tm, tm)][None, :]   # [1, TM]
        y1 = yr_ref[1, pl.ds(j * tm, tm)][None, :]
        y2r = yr_ref[2, pl.ds(j * tm, tm)][None, :]
        y2_t = y2_ref[0, pl.ds(j * tm, tm)][None, :]  # [1, TM]
        d = x2 + y2_t - 2.0 * (x0 * y0 + x1 * y1 + xz * y2r)

        tile_rmin = jnp.min(d, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * tm
        tile_rarg = jnp.min(jnp.where(d <= tile_rmin, cols, jnp.int32(2**30)),
                            axis=1, keepdims=True)
        rbetter = tile_rmin < best_d
        best_d = jnp.where(rbetter, tile_rmin, best_d)
        best_i = jnp.where(rbetter, tile_rarg, best_i)

        tile_cmin = jnp.min(d, axis=0)                   # [TM]
        rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + i * tn
        tile_carg = jnp.min(jnp.where(d <= tile_cmin[None, :], rows,
                                      jnp.int32(2**30)), axis=0)
        prev_min = cmin_scr[0, pl.ds(j * tm, tm)]
        prev_arg = carg_scr[0, pl.ds(j * tm, tm)]
        cbetter = first_x | (tile_cmin < prev_min)
        cmin_scr[0, pl.ds(j * tm, tm)] = jnp.where(cbetter, tile_cmin, prev_min)
        carg_scr[0, pl.ds(j * tm, tm)] = jnp.where(cbetter, tile_carg, prev_arg)
        return best_d, best_i

    init = (jnp.full((tn, 1), _BIG, jnp.float32),
            jnp.zeros((tn, 1), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_ytiles, ybody, init)
    rdist_ref[:] = jnp.maximum(best_d, 0.0)
    ridx_ref[:] = best_i

    @pl.when(i == n_tiles - 1)
    def _():
        cdist_ref[0, :] = jnp.maximum(cmin_scr[0, :], 0.0)
        cidx_ref[0, :] = carg_scr[0, :]


def _nn_dual_kernel_v3(x_ref, y_ref, x2_ref, y2_ref,
                       rdist_ref, ridx_ref, cdist_ref, cidx_ref,
                       cmin_scr, carg_scr, *, tn: int, tm: int, m_pad: int):
    """Packed min+argmin variant of :func:`_nn_dual_kernel`.

    The v1 kernel pays TWO full [TN, TM] reduction traversals per
    direction: min(d), then min(where(d <= min, iota, BIG)) for the
    argmin. Here each direction packs the distance and the tile-local
    index into ONE int32 — for d >= 0 the f32 bit pattern is monotone, so
    ``(bitcast(d) & ~LOW_MASK) | lane_index`` sorts lexicographically by
    (truncated distance, index) and a single integer min yields both.

    Cost: the low 11 mantissa bits of the *selection* distance are
    truncated, so between candidates whose distances agree to ~1.2e-4
    RELATIVE the smaller index wins (v1: smaller index wins on exact ties
    only). The solver consumes only the indices and recomputes exact
    distances from gathers (``ops/chamfer.py``), so a flipped near-tie
    changes a row's loss contribution by <= ~6e-5 relative — unlike the
    bf16 matmul's ~1e-3 ABSOLUTE noise that broke convergence (module
    docstring), this error is relative-bounded and cannot select a
    genuinely farther point. Exact ties still resolve first-index-wins,
    matching v1/XLA.

    Packing is per-tile (11 bits cover tm <= 2048 lane indices and
    tn <= 2048 sublane indices); cross-tile carries compare the unpacked
    (distance, global index) pairs exactly like v1, so m_pad/n_pad are
    unbounded.
    """
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    x = x_ref[:]                    # [TN, D]
    x2 = x2_ref[0, :]               # [TN]
    n_ytiles = m_pad // tm
    first_x = i == 0
    low_mask = jnp.int32(0x7FF)     # 11 index bits

    def ybody(j, carry):
        best_d, best_i = carry      # [TN, 1] row running min/arg
        y_t = y_ref[pl.ds(j * tm, tm), :]          # [TM, D]
        y2_t = y2_ref[0, pl.ds(j * tm, tm)]        # [TM]
        d = x2[:, None] + y2_t[None, :] - 2.0 * (
            x[:, 0:1] * y_t[:, 0][None, :]
            + x[:, 1:2] * y_t[:, 1][None, :]
            + x[:, 2:3] * y_t[:, 2][None, :])
        bits = jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0), jnp.int32)

        # rows: one packed lane-min gives (trunc distance, local col)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        pk_r = (bits & ~low_mask) | cols
        tile_pk = jnp.min(pk_r, axis=1, keepdims=True)          # [TN, 1]
        tile_rmin = jax.lax.bitcast_convert_type(tile_pk & ~low_mask,
                                                 jnp.float32)
        tile_rarg = (tile_pk & low_mask) + j * tm
        rbetter = tile_rmin < best_d
        best_d = jnp.where(rbetter, tile_rmin, best_d)
        best_i = jnp.where(rbetter, tile_rarg, best_i)

        # columns: one packed sublane-min into the global scratch slice
        rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        pk_c = (bits & ~low_mask) | rows
        tile_cpk = jnp.min(pk_c, axis=0)                        # [TM]
        tile_cmin = jax.lax.bitcast_convert_type(tile_cpk & ~low_mask,
                                                 jnp.float32)
        tile_carg = (tile_cpk & low_mask) + i * tn
        prev_min = cmin_scr[0, pl.ds(j * tm, tm)]
        prev_arg = carg_scr[0, pl.ds(j * tm, tm)]
        cbetter = first_x | (tile_cmin < prev_min)
        cmin_scr[0, pl.ds(j * tm, tm)] = jnp.where(cbetter, tile_cmin, prev_min)
        carg_scr[0, pl.ds(j * tm, tm)] = jnp.where(cbetter, tile_carg, prev_arg)
        return best_d, best_i

    init = (jnp.full((tn, 1), _BIG, jnp.float32),
            jnp.zeros((tn, 1), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_ytiles, ybody, init)
    rdist_ref[:] = best_d
    ridx_ref[:] = best_i

    @pl.when(i == n_tiles - 1)
    def _():
        cdist_ref[0, :] = cmin_scr[0, :]
        cidx_ref[0, :] = carg_scr[0, :]


def _nn_dual_kernel_v4(xa_ref, yat_ref,
                       rdist_ref, ridx_ref, cdist_ref, cidx_ref,
                       cmin_scr, carg_scr, *, tn: int, tm: int, m_pad: int,
                       mode: str):
    """MXU-distance variant of :func:`_nn_dual_kernel_v3`.

    v3's distance tile costs ~8 VPU ops/element (3 broadcast products, 2
    adds, the x2+y2-2c combine) while the MXU idles. Here the whole tile
    is ONE augmented matmul: rows ``[|x|^2, 1, x]`` times columns
    ``[1, |y|^2, -2y]^T`` give ``|x|^2 + |y|^2 - 2<x,y>`` directly, so the
    VPU only packs and reduces (the v3 packed min+argmin).

    ``mode``: "bf16x3" (default) splits each operand into its bf16 high
    part and f32 remainder and sums 3 single-pass products — ~f32
    fidelity (error ~2^-16 relative of the largest term, i.e. absolute
    ~1.5e-5 * scale^2) at half of HIGHEST's 6 MXU passes. Unlike the
    round-2 single-pass bf16 attempt (4e-3 absolute — broke convergence)
    this stays well inside the packed reduction's own ~1.2e-4 near-tie
    band, and the wrapper rebuilds returned distances exactly from
    gathers. "highest" keeps exact f32 (6 passes) for A/B.

    Padded rows/cols carry ``_BIG`` in their squared-norm slot; the worst
    case BIG+BIG overflows to +inf whose bit pattern still sorts above
    every finite distance (same as v3's elementwise form).
    """
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    xa = xa_ref[:]                  # [TN, 5] = [|x|^2, 1, x, y, z]
    n_ytiles = m_pad // tm
    first_x = i == 0
    low_mask = jnp.int32(0x7FF)     # 11 index bits

    if mode == "bf16x3":
        xa_hi = xa.astype(jnp.bfloat16).astype(jnp.float32)
        xa_lo = xa - xa_hi

    def ybody(j, carry):
        best_d, best_i = carry      # [TN, 1] row running min/arg
        ya = yat_ref[:, pl.ds(j * tm, tm)]         # [5, TM]
        if mode == "bf16x3":
            ya_hi = ya.astype(jnp.bfloat16).astype(jnp.float32)
            ya_lo = ya - ya_hi

            def dd(u, v):
                return jnp.dot(u, v, preferred_element_type=jnp.float32)

            d = dd(xa_hi, ya_lo) + dd(xa_lo, ya_hi) + dd(xa_hi, ya_hi)
        else:
            d = jnp.dot(xa, ya, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        bits = jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0), jnp.int32)

        # rows: one packed lane-min gives (trunc distance, local col)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        pk_r = (bits & ~low_mask) | cols
        tile_pk = jnp.min(pk_r, axis=1, keepdims=True)          # [TN, 1]
        tile_rmin = jax.lax.bitcast_convert_type(tile_pk & ~low_mask,
                                                 jnp.float32)
        tile_rarg = (tile_pk & low_mask) + j * tm
        rbetter = tile_rmin < best_d
        best_d = jnp.where(rbetter, tile_rmin, best_d)
        best_i = jnp.where(rbetter, tile_rarg, best_i)

        # columns: one packed sublane-min into the global scratch slice
        rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        pk_c = (bits & ~low_mask) | rows
        tile_cpk = jnp.min(pk_c, axis=0)                        # [TM]
        tile_cmin = jax.lax.bitcast_convert_type(tile_cpk & ~low_mask,
                                                 jnp.float32)
        tile_carg = (tile_cpk & low_mask) + i * tn
        prev_min = cmin_scr[0, pl.ds(j * tm, tm)]
        prev_arg = carg_scr[0, pl.ds(j * tm, tm)]
        cbetter = first_x | (tile_cmin < prev_min)
        cmin_scr[0, pl.ds(j * tm, tm)] = jnp.where(cbetter, tile_cmin, prev_min)
        carg_scr[0, pl.ds(j * tm, tm)] = jnp.where(cbetter, tile_carg, prev_arg)
        return best_d, best_i

    init = (jnp.full((tn, 1), _BIG, jnp.float32),
            jnp.zeros((tn, 1), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_ytiles, ybody, init)
    rdist_ref[:] = best_d
    ridx_ref[:] = best_i

    @pl.when(i == n_tiles - 1)
    def _():
        cdist_ref[0, :] = cmin_scr[0, :]
        cidx_ref[0, :] = carg_scr[0, :]


@functools.partial(jax.jit, static_argnames=("tn", "mode"))
def _nn_dual_pallas_padded_v4(x_pad: Array, y_pad: Array, x2: Array,
                              y2: Array, tn: int = 1024,
                              mode: str = "bf16x3"):
    """pallas_call wrapper for :func:`_nn_dual_kernel_v4`: builds the
    augmented operands outside the kernel (lane-axis concatenation is not
    Mosaic-legal inside)."""
    n_pad, d = x_pad.shape
    m_pad = y_pad.shape[0]
    # tm capped at 1024 (vs v3's 2048): the hi/lo split temporaries push
    # a [1024, 2048] tile 344 KB past the 16 MB scoped-VMEM budget
    # (measured 16.34 MB). m_pad is always a multiple of 256 (caller
    # rounding), so step down until tm divides it.
    if m_pad <= 1024:
        tm = m_pad
    else:
        tm = next(t for t in (1024, 512, 256) if m_pad % t == 0)
    ones_n = jnp.ones((n_pad, 1), jnp.float32)
    xa = jnp.concatenate([x2[:, None], ones_n, x_pad], axis=1)   # [N, 5]
    yat = jnp.concatenate([jnp.ones((1, m_pad), jnp.float32), y2[None, :],
                           -2.0 * y_pad.T], axis=0)              # [5, M]
    kernel = functools.partial(_nn_dual_kernel_v4, tn=tn, tm=tm,
                               m_pad=m_pad, mode=mode)
    grid = (n_pad // tn,)
    rdist, ridx, cdist, cidx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d + 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d + 2, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, m_pad), jnp.float32),
            pltpu.VMEM((1, m_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * (d + 2)
            * (3 if mode == "bf16x3" else 6),
            bytes_accessed=(n_pad * (d + 2) + m_pad * (d + 2)
                            + 2 * (n_pad + m_pad)) * 4,
            transcendentals=0,
        ),
    )(xa, yat)
    return rdist[:, 0], ridx[:, 0], cdist[0], cidx[0]


@functools.partial(jax.jit, static_argnames=("tn",))
def _nn_dual_pallas_padded_v3(x_pad: Array, y_pad: Array, x2: Array,
                              y2: Array, tn: int = 1024):
    """pallas_call wrapper for :func:`_nn_dual_kernel_v3` (v1 operand
    layouts; packed reductions inside)."""
    n_pad, d = x_pad.shape
    m_pad = y_pad.shape[0]
    tm = min(m_pad, 2048)
    kernel = functools.partial(_nn_dual_kernel_v3, tn=tn, tm=tm, m_pad=m_pad)
    grid = (n_pad // tn,)
    rdist, ridx, cdist, cidx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, m_pad), jnp.float32),
            pltpu.VMEM((1, m_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * (d + 4),
            bytes_accessed=(n_pad * d + m_pad * d + 2 * (n_pad + m_pad)) * 4,
            transcendentals=0,
        ),
    )(x_pad, y_pad, x2[None, :], y2[None, :])
    return rdist[:, 0], ridx[:, 0], cdist[0], cidx[0]


@functools.partial(jax.jit, static_argnames=("tn",))
def _nn_dual_pallas_padded_v2(x_pad: Array, y_rows: Array, x2c: Array,
                              y2: Array, tn: int = 1024):
    """pallas_call wrapper for :func:`_nn_dual_kernel_v2`.

    x_pad [N_pad, 3], y_rows [3, M_pad] (pre-transposed), x2c [N_pad, 1]
    column, y2 [1, M_pad]; +BIG already written at invalid entries of
    x2c/y2.
    """
    n_pad, d = x_pad.shape
    m_pad = y_rows.shape[1]
    # tm capped at 1024 (v1 uses 2048): the outer-product distance form
    # materializes more [tn, tm] temporaries than v1's — tm=2048 blew the
    # 16 MB scoped-VMEM budget by 952 KB at tn=1024 (measured).
    tm = min(m_pad, 1024)
    kernel = functools.partial(_nn_dual_kernel_v2, tn=tn, tm=tm, m_pad=m_pad)
    grid = (n_pad // tn,)
    rdist, ridx, cdist, cidx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, m_pad), jnp.float32),
            pltpu.VMEM((1, m_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * (d + 4),
            bytes_accessed=(n_pad * d + m_pad * d + 2 * (n_pad + m_pad)) * 4,
            transcendentals=0,
        ),
    )(x_pad, x2c, y_rows, y2)
    return rdist[:, 0], ridx[:, 0], cdist[0], cidx[0]


@functools.partial(jax.jit, static_argnames=("tn", "elementwise"))
def _nn_dual_pallas_padded(x_pad: Array, y_pad: Array, x2: Array, y2: Array,
                           tn: int = 1024, elementwise: bool = True):
    # elementwise default: exact-f32 FMA distances measured 16% faster than
    # the Precision.HIGHEST K=3 matmul (0.047 vs 0.055 ms/sweep, round 2).
    # tn default 1024 (was 512): 12% faster at B=1 n=2000 (0.1007 vs
    # 0.1145 ms/sweep, round-3 tile sweep) and within noise of 512 at B=4;
    # the in-kernel [tn, tm<=2048] distance block is 8 MB VMEM, computed
    # (not pipelined), so it fits the ~16 MB budget.
    n_pad, d = x_pad.shape
    m_pad = y_pad.shape[0]
    tm = min(m_pad, 2048)
    kernel = functools.partial(_nn_dual_kernel, tn=tn, tm=tm, m_pad=m_pad,
                               elementwise=elementwise and d == 3)
    grid = (n_pad // tn,)
    rdist, ridx, cdist, cidx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, m_pad), jnp.float32),
            pltpu.VMEM((1, m_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * (d + 4),
            bytes_accessed=(n_pad * d + m_pad * d + 2 * (n_pad + m_pad)) * 4,
            transcendentals=0,
        ),
    )(x_pad, y_pad, x2[None, :], y2[None, :])
    return rdist[:, 0], ridx[:, 0], cdist[0], cidx[0]


# Dual-sweep kernel variant. Module knob so A/B scripts can flip it;
# measured on-chip (scripts/ab_dual_variant.py, n=2000, round 3):
#   v1 (baseline)                      0.106 ms/sweep
#   v2 (transpose-free layouts)        0.114 ms/sweep  — parked: the
#       outer-product distance form needs more [tn, tm] temporaries, so
#       its tile is VMEM-capped at 1024 and it loses ~8%
#   v3 (packed min+argmin)             0.097 ms/sweep  — one packed
#       integer reduction replaces the min + masked-iota-min pair per
#       direction; selection deviates only on <=1.2e-4-RELATIVE near-ties
#       (0 observed), distances are rebuilt exactly from gathers
#   v4 (v3 + MXU bf16x3 distances)     same-session A/B at tn=1024:
#       0.1138 vs v3's 0.1192 ms/sweep (~4.5%) — the distance tile
#       becomes one augmented matmul ([|x|^2,1,x] @ [1,|y|^2,-2y]^T) so
#       the VPU only packs/reduces; at tn=512 it LOSES (0.1185 vs
#       0.1134, the hi/lo split temporaries dominate the smaller tile),
#       hence the tn-gated default below. "v4h" keeps exact-f32 matmuls
#       (6 MXU passes) for A/B: 0.126 ms — the 3-pass split wins.
#   None = auto: v4 at tn=1024 (solver shapes, m_pad<=2048), v3 at
#       tn=512 (big-bucket shapes).
_DUAL_VARIANT = None


def nn_argmin_dual_pallas(x: Array, y: Array,
                          x_valid: Array | None = None,
                          y_valid: Array | None = None,
                          tn: int | None = None,
                          variant: str | None = None) -> tuple[Array, Array, Array, Array]:
    """Both-direction 1-NN in a single distance-tile sweep.

    Returns (sq_x2y [N], idx_x2y [N], sq_y2x [M], idx_y2x [M]). The fused
    pass halves the N x M work of calling :func:`nn_argmin` twice and keeps
    the distance matrix entirely in VMEM — the Chamfer hot path.

    ``variant``: "v1" (exact first-win argmin), "v2" (transpose-free,
    parked), "v3" (packed reductions), "v4"/"v4h" (v3 + MXU distances).
    Default is tile-size-gated — see ``_DUAL_VARIANT``.
    """
    n, d = x.shape
    m = y.shape[0]
    # m_pad must be a multiple of the inner y-tile (2048 cap) so every
    # y row is scanned by the fori loop
    m_pad = _round_up(max(m, 256), 256)
    if m_pad > 2048:
        m_pad = _round_up(m_pad, 2048)
    if tn is None:
        # tn=1024 is 12% faster at the solver's m_pad<=2048 shapes
        # (round-3 tile sweep) but its [1024, 2048] in-kernel distance
        # block OOMs the 16 MB scoped-VMEM budget once m_pad > 2048
        # (measured: 16.67 MB at m_pad=4096) — fall back to 512 there.
        tn = 1024 if m_pad <= 2048 else 512
    n_pad = _round_up(max(n, tn), tn)
    x_pad = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(x.astype(jnp.float32))
    y_pad = jnp.zeros((m_pad, d), jnp.float32).at[:m].set(y.astype(jnp.float32))
    x2 = jnp.sum(x_pad * x_pad, axis=-1)
    y2 = jnp.sum(y_pad * y_pad, axis=-1)
    xv = jnp.arange(n_pad) < n
    if x_valid is not None:
        xv = xv & jnp.pad(x_valid, (0, n_pad - n), constant_values=False)
    yv = jnp.arange(m_pad) < m
    if y_valid is not None:
        yv = yv & jnp.pad(y_valid, (0, m_pad - m), constant_values=False)
    x2 = jnp.where(xv, x2, _BIG)
    y2 = jnp.where(yv, y2, _BIG)
    if variant is None:
        variant = _DUAL_VARIANT
    if variant is None:
        variant = "v4" if tn == 1024 else "v3"
    if variant == "v2":
        # y's coordinate rows are loop-invariant in the solver, so XLA
        # hoists this transpose out of the while_loop.
        rdist, ridx, cdist, cidx = _nn_dual_pallas_padded_v2(
            x_pad, y_pad.T, x2[:, None], y2[None, :], tn=tn)
    elif variant in ("v3", "v4", "v4h"):
        if variant == "v3":
            rdist, ridx, cdist, cidx = _nn_dual_pallas_padded_v3(
                x_pad, y_pad, x2, y2, tn=tn)
        else:
            rdist, ridx, cdist, cidx = _nn_dual_pallas_padded_v4(
                x_pad, y_pad, x2, y2, tn=tn,
                mode="highest" if variant == "v4h" else "bf16x3")
        # The packed kernels' distances carry truncated mantissas; the
        # contract promises exact squared distances, so rebuild them from
        # the (exact-selection-or-near-tie) indices — O(N+M) gathers.
        rdist = jnp.sum((x_pad - y_pad[ridx]) ** 2, axis=-1)
        cdist = jnp.sum((y_pad - x_pad[cidx]) ** 2, axis=-1)
    else:
        rdist, ridx, cdist, cidx = _nn_dual_pallas_padded(
            x_pad, y_pad, x2, y2, tn=tn)
    return rdist[:n], ridx[:n], cdist[:m], cidx[:m]


def nn_argmin_dual(x: Array, y: Array,
                   x_valid: Array | None = None,
                   y_valid: Array | None = None,
                   use_pallas: bool | None = None):
    """Dispatch: fused Pallas sweep on TPU, two XLA argmins elsewhere."""
    if use_pallas is None:
        use_pallas = _HAS_PLTPU and on_tpu()
    if use_pallas:
        return nn_argmin_dual_pallas(x, y, x_valid, y_valid)
    sq_x, idx_x = nn_argmin_xla(x, y, y_valid)
    sq_y, idx_y = nn_argmin_xla(y, x, x_valid)
    return sq_x, idx_x, sq_y, idx_y


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def nn_argmin(x: Array, y: Array, y_valid: Array | None = None,
              use_pallas: bool | None = None) -> tuple[Array, Array]:
    """Dispatch to the Pallas kernel on TPU, XLA elsewhere.

    ``use_pallas=None`` auto-selects: Pallas on TPU for database sizes where
    streaming beats one fused XLA matmul+argmin.
    """
    if use_pallas is None:
        use_pallas = _HAS_PLTPU and on_tpu() and (x.shape[0] * y.shape[0] >= 4096 * 4096)
    if use_pallas:
        return nn_argmin_pallas(x, y, y_valid)
    return nn_argmin_xla(x, y, y_valid)
