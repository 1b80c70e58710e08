"""Fused truncated-Chamfer L1 loss with in-sweep gradient (Pallas).

The solver's per-iteration chamfer path (``ops/chamfer.truncated_chamfer``)
is: argmin sweep kernel -> XLA gathers -> distance recompute -> masked sqrt
reductions -> backward through gathers (a scatter-add for the y->x
direction). At B=1 the iteration is launch-bound (~25 dispatches for ~0.3
GFLOP), so this op collapses the whole loss into ONE kernel pass:

* grid over y-tiles with the (padded) query cloud resident in VMEM,
* per tile: one [N, ty] distance block (exact-f32 elementwise FMA — see
  ops/knn.py on why bf16/matmul precision is load-bearing),
* the column (y->x) direction is FINISHED per tile (every column sees all
  N rows at once), so its loss contribution AND its gradient scatter
  (sum over y of (w_i - y_j)/d at winning rows — the XLA-scatter hot spot)
  are accumulated in-sweep as compare + matmul (MXU),
* the row (x->y) direction keeps a running (min, argmin) scratch like the
  argmin kernel; its loss sum is finished on the last tile; its gradient is
  cheap XLA elementwise (one gather of y[argmin]) in the custom VJP.

Loss semantics are identical to ``truncated_chamfer`` (reference
``model/loss.py:185-258``): squared-distance truncation, L1 (sqrt) point
reduction, mean over true lengths, the 1e-16 sqrt floor of
``_gathered_sum``. Gradient flows to the QUERY cloud only (the solver's
warped points); the database/target is treated as constant — exactly how
the solver consumes it (``solve/registration.py:103``).
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

_BIG = 3.0e38
_FLOOR = 1e-16  # sqrt floor, matches ops/chamfer._gathered_sum


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(w_ref, w2_ref, y_ref, y2_ref,
            rsum_ref, csum_ref, cgrad_ref, rmin_ref, rarg_ref,
            rmin_scr, rarg_scr, cgrad_scr, csum_scr,
            *, ty: int, trunc: float):
    """One y-tile step. w: [N, 3] resident queries; w2/y2 carry +BIG at
    invalid/padded rows so they never win a min and always fail ``trunc``."""
    j = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    w = w_ref[:]                           # [N, 3]
    w2 = w2_ref[:, 0:1]                    # [N, 1]
    y_t = y_ref[:]                         # [ty, 3] (blocked over grid)
    y2_t = y2_ref[0:1, :]                  # [1, ty]

    # EXACT squared distances (sum of squared differences), NOT the
    # x2+y2-2xy form: near convergence true distances are ~1e-7 while the
    # FMA form's cancellation noise at |x|~1 is ~6e-8 — the loss value
    # would be noise-dominated, breaking early-stop parity (measured: +37%
    # iterations). The argmin-only kernel (ops/knn.py) can use the fast
    # form because it recomputes the loss from gathers; here the sweep's
    # min IS the loss. w2/y2 are only used as +BIG validity masks.
    d0 = w[:, 0:1] - y_t[:, 0][None, :]
    d1 = w[:, 1:2] - y_t[:, 1][None, :]
    d2 = w[:, 2:3] - y_t[:, 2][None, :]
    d = d0 * d0 + d1 * d1 + d2 * d2        # [N, ty]
    d = d + jnp.where(w2 >= _BIG, _BIG, 0.0) \
        + jnp.where(y2_t >= _BIG, _BIG, 0.0)

    # ---- column direction (y -> x): finished within this tile ----
    cmin = jnp.min(d, axis=0)              # [ty]
    rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    carg = jnp.min(jnp.where(d <= cmin[None, :], rows, jnp.int32(2**30)),
                   axis=0)                 # [ty] first-win argmin
    keep_c = cmin < trunc                  # +BIG rows/cols auto-fail
    safe_c = jnp.maximum(cmin, _FLOOR)
    sqrt_c = jnp.sqrt(safe_c)
    col_loss = jnp.sum(jnp.where(keep_c, sqrt_c, 0.0))
    # gradient wrt w of sum_j sqrt(|y_j - w_{carg_j}|^2):
    #   for each j, (w_i - y_j)/sqrt(d) lands on row i = carg_j.
    # lane-axis reductions (VPU) beat [N, ty] @ [ty, 3] one-hot matmuls:
    # the 3-wide output wastes 125/128 of the MXU (measured 2x slower).
    s = jnp.where(keep_c, 1.0 / sqrt_c, 0.0)          # [ty]
    winner_s = jnp.where(rows == carg[None, :], s[None, :], 0.0)  # [N, ty]
    cnt = jnp.sum(winner_s, axis=1, keepdims=True)    # [N, 1]
    sy = jnp.stack([
        jnp.sum(winner_s * y_t[:, k][None, :], axis=1) for k in range(3)
    ], axis=-1)                                       # [N, 3]
    tile_cgrad = w * cnt - sy

    # ---- row direction (x -> y): running min across tiles ----
    tile_rmin = jnp.min(d, axis=1, keepdims=True)      # [N, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * ty
    tile_rarg = jnp.min(jnp.where(d <= tile_rmin, cols, jnp.int32(2**30)),
                        axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        rmin_scr[:] = tile_rmin
        rarg_scr[:] = tile_rarg
        cgrad_scr[:] = tile_cgrad
        csum_scr[0, 0] = col_loss

    @pl.when(j > 0)
    def _():
        better = tile_rmin < rmin_scr[:]
        rmin_scr[:] = jnp.where(better, tile_rmin, rmin_scr[:])
        rarg_scr[:] = jnp.where(better, tile_rarg, rarg_scr[:])
        cgrad_scr[:] = cgrad_scr[:] + tile_cgrad
        csum_scr[0, 0] = csum_scr[0, 0] + col_loss

    @pl.when(j == n_tiles - 1)
    def _():
        rmin = jnp.maximum(rmin_scr[:], 0.0)
        keep_r = rmin < trunc
        rsum_ref[0, 0] = jnp.sum(
            jnp.where(keep_r, jnp.sqrt(jnp.maximum(rmin, _FLOOR)), 0.0))
        csum_ref[0, 0] = csum_scr[0, 0]
        cgrad_ref[:] = cgrad_scr[:]
        rmin_ref[:] = rmin
        rarg_ref[:] = rarg_scr[:]


@functools.partial(jax.jit, static_argnames=("ty", "trunc", "interpret"))
def _fused_padded(w_pad, w2, y_pad, y2, ty: int, trunc: float,
                  interpret: bool):
    n_pad = w_pad.shape[0]
    m_pad = y_pad.shape[0]
    kernel = functools.partial(_kernel, ty=ty, trunc=trunc)
    grid = (m_pad // ty,)
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    smem = {} if interpret else {"memory_space": pltpu.SMEM}
    scratch = [
        pltpu.VMEM((n_pad, 1), jnp.float32),
        pltpu.VMEM((n_pad, 1), jnp.int32),
        pltpu.VMEM((n_pad, 3), jnp.float32),
        pltpu.SMEM((1, 1), jnp.float32),
    ]
    rsum, csum, cgrad, rmin, rarg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, 3), lambda j: (0, 0), **mem),
            pl.BlockSpec((n_pad, 1), lambda j: (0, 0), **mem),
            pl.BlockSpec((ty, 3), lambda j: (j, 0), **mem),
            pl.BlockSpec((1, ty), lambda j: (0, j), **mem),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), **smem),
            pl.BlockSpec((1, 1), lambda j: (0, 0), **smem),
            pl.BlockSpec((n_pad, 3), lambda j: (0, 0), **mem),
            pl.BlockSpec((n_pad, 1), lambda j: (0, 0), **mem),
            pl.BlockSpec((n_pad, 1), lambda j: (0, 0), **mem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * 12,
            bytes_accessed=(n_pad * 8 + m_pad * 4) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(w_pad, w2, y_pad, y2)
    return rsum[0, 0], csum[0, 0], cgrad, rmin[:, 0], rarg[:, 0]


def _prep(w, y, x_valid, y_valid):
    """Pad to tileable shapes. m_pad is either < 256 (single tile) or a
    multiple of 256, so the kernel tile ``ty = min(256, m_pad)`` always
    divides it."""
    n, _ = w.shape
    m = y.shape[0]
    n_pad = _round_up(max(n, 8), 8)
    m128 = _round_up(max(m, 128), 128)
    ty = 256 if m128 >= 256 else m128
    m_pad = _round_up(m, ty)
    w_pad = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(
        w.astype(jnp.float32))
    y_pad = jnp.zeros((m_pad, 3), jnp.float32).at[:m].set(
        y.astype(jnp.float32))
    w2 = jnp.sum(w_pad * w_pad, axis=-1)
    y2 = jnp.sum(y_pad * y_pad, axis=-1)
    xv = jnp.arange(n_pad) < n
    if x_valid is not None:
        xv = xv & jnp.pad(x_valid, (0, n_pad - n), constant_values=False)
    yv = jnp.arange(m_pad) < m
    if y_valid is not None:
        yv = yv & jnp.pad(y_valid, (0, m_pad - m), constant_values=False)
    w2 = jnp.where(xv, w2, _BIG)
    y2 = jnp.where(yv, y2, _BIG)
    return w_pad, w2[:, None], y_pad, y2[None, :], n_pad, m_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _core(w_pad, w2, y_pad, y2, x_len, y_len, trunc, interpret):
    loss, _ = _core_fwd(w_pad, w2, y_pad, y2, x_len, y_len, trunc, interpret)
    return loss


def _core_fwd(w_pad, w2, y_pad, y2, x_len, y_len, trunc, interpret):
    rsum, csum, cgrad, rmin, rarg = _fused_padded(
        w_pad, w2, y_pad, y2, ty=min(256, y_pad.shape[0]), trunc=trunc,
        interpret=interpret)
    loss = rsum / x_len + csum / y_len
    return loss, (w_pad, w2, y_pad, y2, cgrad, rmin, rarg, x_len, y_len)


def _core_bwd(trunc, interpret, res, g):
    w_pad, w2, y_pad, y2, cgrad, rmin, rarg, x_len, y_len = res
    # analytic total derivative wrt the query points: row direction via the
    # gathered NN (one XLA gather), column direction pre-accumulated by the
    # kernel; rows with rmin >= trunc (incl. +BIG invalid rows) get zero.
    keep = rmin < trunc
    inv = jnp.where(keep, 1.0 / jnp.sqrt(jnp.maximum(rmin, _FLOOR)), 0.0)
    nn = y_pad[rarg]
    grad_w = g * ((w_pad - nn) * inv[:, None] / x_len + cgrad / y_len)
    return (grad_w, jnp.zeros_like(w2), jnp.zeros_like(y_pad),
            jnp.zeros_like(y2), jnp.zeros_like(x_len), jnp.zeros_like(y_len))


_core.defvjp(_core_fwd, _core_bwd)


def chamfer_l1_fused(w: Array, y: Array,
                     x_valid: Array | None = None,
                     y_valid: Array | None = None,
                     x_length: Array | float | None = None,
                     y_length: Array | float | None = None,
                     trunc: float = 1e9,
                     interpret: bool | None = None) -> Array:
    """Truncated chamfer L1 loss; gradient flows to ``w`` ONLY.

    Same value as ``ops.chamfer.truncated_chamfer`` (modulo f32 rounding:
    the sweep deliberately computes exact sum-of-squared-difference
    distances — the x2+y2-2xy form's cancellation error is the same order
    as converged distances, see the kernel's distance comment — so the
    residual drift comes only from reduction ordering);
    one kernel forward, elementwise backward. ``y`` is constant, matching
    the solver's use where the target sample is never optimized
    (``solve/registration.py:103``; reference ``registration.py:205-216``).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n, m = w.shape[0], y.shape[0]
    if x_length is None:
        x_length = jnp.sum(x_valid) if x_valid is not None else n
    if y_length is None:
        y_length = jnp.sum(y_valid) if y_valid is not None else m
    w_pad, w2, y_pad, y2, _, _ = _prep(w, y, x_valid, y_valid)
    # The analytic VJP in _core_bwd is the TOTAL derivative wrt w, so the
    # w -> w2 dependence must not ALSO contribute through autodiff.
    w2 = jax.lax.stop_gradient(w2)
    x_len = jnp.asarray(x_length, jnp.float32)
    y_len = jnp.asarray(y_length, jnp.float32)
    return _core(w_pad, w2, y_pad, y2, x_len, y_len, float(trunc),
                 bool(interpret))


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
