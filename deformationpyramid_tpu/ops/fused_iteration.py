"""Two-kernel fused solver iteration (Pallas).

The NDP solver's per-iteration critical path at B=1 is a serial chain of
~25 small dispatches (posenc -> MLP -> heads -> Rodrigues -> argmin sweep
-> gathers -> loss -> backward -> Adam) for ~0.3 GFLOP — launch/latency
bound, not bandwidth bound (docs/PERFORMANCE.md round-3 ablation). This
module collapses the chain into TWO Pallas launches plus O(N) XLA glue:

* **kernel 1** (:func:`_fwd_sweep_kernel`): the full level warp in the
  [3, N] transposed layout (``ops/fused_level._forward_math_t``) feeding
  straight into the v1 dual argmin sweep — the warped cloud never leaves
  VMEM between the warp and the N x M distance tiles. Outputs: warped
  points + both directions' (min, argmin).
* **XLA glue** (:func:`_chamfer_glue`): the O(N) differentiable loss
  rebuild from gathers — bit-identical math to
  ``ops/chamfer._gathered_sum`` — with its analytic gradient wrt the
  warped points (one gather + one scatter-add; XLA fuses the elementwise
  chain around them).
* **kernel 2** (:func:`_bwd_adam_kernel`): jax.vjp of the warp chain
  (forward recomputed in VMEM, the ``ops/fused_level`` pattern) +
  the optax-Adam update + the early-stop ``done`` gate, all in one
  launch, so the parameter/moment tensors never round-trip HBM between
  backward and update.

Deliberately NOT fused: the chamfer gradient's in-sweep accumulation.
Doing the scatter/gather work inside the distance sweep costs ~11 extra
full passes over the [tm, N] blocks (measured round 2: the one-kernel
chamfer-loss lost 1.6x for exactly this reason) while the O(N) glue is
~launch-cost only.

Semantics: matches ``solve/loop.run_adam_loop`` + ``truncated_chamfer``
exactly (loss formula, 3-way early stop, pre-step aux handoff, optax Adam
with bias correction); numerics differ only by f32 reassociation and the
in-kernel bf16x3 wide matmuls (``ops/fused_level._dot_wide``). Parity is
pinned by tests/test_fused_iteration.py. Covers every chamfer-mode NDP
config (SE3/Sim3/sflow, all four rotation formats — the benchmark
``config/NDP.yaml`` and the Sim3 shape-transfer demo; hot loop
``/root/reference/model/registration.py:184-238``) plus the one-kernel
landmark mode below; the nonrigidity branch (w_reg > 0) uses the
unfused path.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; keep module importable on CPU.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from .fused_level import _dot_wide, _forward_math_t

Array = jax.Array

_BIG = 3.0e38


def _compiler_params(interpret: bool):
    """Raise Mosaic's 16 MB scoped-VMEM cap for the fused kernels.

    The NDP kernels fit the default, but NSFP's deeper MLP (8 hidden
    layers) pushes the backward+Adam kernel's stack to ~19 MB at
    tn=2048 (measured on-chip: `scripts/ab_nsfp_iteration.py` failed
    compile with 18.58M vs the 16M default). 64 MB leaves half of a
    v5e core's 128 MB VMEM for double-buffered operands.
    """
    if interpret or not _HAS_PLTPU:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
_FLOOR = 1e-16  # sqrt floor, matches ops/chamfer._gathered_sum
_LOW_MASK = 0x7FF  # 11 packed index bits (ops/knn v3 scheme)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Kernel 1: level warp forward + dual argmin sweep
# ---------------------------------------------------------------------------

_N_PARAMS = 9  # w_sin_t, w_cos_t, b_in_t, wh_t, bh_t, w_rot_t, b_rot_t,
#                w_trn_t, b_trn_t — the _forward_math_t parameter order
#                (+2 for Sim3: w_scl_t, b_scl_t; -2 for sflow: no rot pair;
#                +2 trailing for nonrigidity: w_nr_t, b_nr_t; see params_to_t)


def _n_params(motion: str, nonrigid: bool = False) -> int:
    n = _N_PARAMS
    if motion == "sflow":
        n -= 2
    elif motion == "Sim3":
        n += 2
    return n + (2 if nonrigid else 0)


def _nsfp_forward_t(xt, *p):
    """Transposed NSFP flow field (``models/baselines.nsfp_flow``,
    reference ``nets.py:256-292``): [3, N] points through an L-layer MLP
    ([out, in] weights, [out, 1] biases, ReLU on all but the last
    layer), returning the warped points ``xt + flow``. ``p`` interleaves
    (w0_t, b0, w1_t, b1, ...); wide matmuls via bf16x3 (`_dot_wide`)."""
    h = xt
    n_layers = len(p) // 2
    for i in range(n_layers):
        h = _dot_wide(p[2 * i], h) + p[2 * i + 1]
        if i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
    return xt + h


def _fwd_model_t(model: str, xt, freq, p, *, mlp_scale, motion,
                 rotation_format, nonrigid, gate):
    """Static dispatch of the in-kernel forward: "ndp" (the pyramid
    level warp) or "nsfp" (the Neural Prior flow field)."""
    if model == "nsfp":
        return _nsfp_forward_t(xt, *p)
    return _forward_math_t(xt, freq, *p, mlp_scale=mlp_scale,
                           motion=motion, rotation_format=rotation_format,
                           nonrigid=nonrigid, gate=gate)


def _fwd_sweep_kernel(freq_ref, gate_ref, xt_ref, xbig_ref, yc_ref,
                      ysqb_ref, *refs, mlp_scale: float, tm: int,
                      m_pad: int, mxu_dist: bool, packed: bool,
                      motion: str, rotation_format: str, nonrigid: bool,
                      np_: int, model: str):
    """Warp the level's points, then sweep distance tiles for both 1-NN
    directions.

    Layout: warped stays [3, N] (coordinate rows, N on lanes); the
    distance block is [tm, N] — y's coordinate COLUMNS ([tm, 1] slices of
    ``yc``) against warped's coordinate ROWS, so the per-y direction
    reduces over lanes and the per-x direction over sublanes with a
    cross-tile carry.

    ``mxu_dist``: compute the cross term as one ``[tm,3] @ [3,N]``
    bf16x3 matmul (``ops/fused_level._dot_wide``) instead of ~7 VPU
    broadcast passes — ~1.5e-5-absolute rounding, i.e. near-tie index
    flips only (the loss glue recomputes exact distances from indices).
    ``packed``: the ops/knn v3 scheme — for d >= 0 the f32 bit pattern
    is monotone, so ``(bitcast(d) & ~0x7FF) | index`` makes ONE integer
    min return (truncated distance, argmin) per direction; requires
    n_pad and m_pad <= 2048 (11 index bits). First-index-wins on exact
    ties, flips only within the ~1.2e-4-relative truncation band.
    With both off this is the v1-exact selection semantics.

    ``xbig``/``ysqb`` carry +BIG at padded/invalid entries so they never
    win a min in either direction.
    """
    p_refs = refs[:np_]
    if nonrigid:
        (warped_ref, cmin_ref, cidx_ref, rmin_ref, rarg_ref,
         nr_ref) = refs[np_:]
    else:
        warped_ref, cmin_ref, cidx_ref, rmin_ref, rarg_ref = refs[np_:]
    xt = xt_ref[:]
    freq = freq_ref[0, 0]
    out = _fwd_model_t(model, xt, freq, [r[:] for r in p_refs],
                       mlp_scale=mlp_scale, motion=motion,
                       rotation_format=rotation_format,
                       nonrigid=nonrigid,
                       gate=gate_ref[0, 0] if nonrigid else None)
    if nonrigid:
        warped, nr = out
        nr_ref[:] = nr
    else:
        warped = out
    warped_ref[:] = warped
    w0 = warped[0:1, :]
    w1 = warped[1:2, :]
    w2 = warped[2:3, :]
    wsq = w0 * w0 + w1 * w1 + w2 * w2 + xbig_ref[:]   # [1, N]
    n_tiles = m_pad // tm

    def dist_tile(j):
        sl = pl.ds(j * tm, tm)
        ysq = ysqb_ref[sl, 0:1]                        # [tm, 1]
        if mxu_dist:
            yneg2 = yc_ref[sl, :] * -2.0               # [tm, 3]
            d = _dot_wide(yneg2, warped) + wsq + ysq   # [tm, N]
        else:
            y0 = yc_ref[sl, 0:1]                       # [tm, 1]
            y1 = yc_ref[sl, 1:2]
            y2 = yc_ref[sl, 2:3]
            d = ysq + wsq - 2.0 * (y0 * w0 + y1 * w1 + y2 * w2)
        return sl, d

    n_lanes = xt.shape[1]
    if packed:
        def body(j, cpk):
            sl, d = dist_tile(j)
            bits = jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0),
                                                jnp.int32)
            # per-y (x index over lanes): finished within this tile
            lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            rpk = jnp.min((bits & ~_LOW_MASK) | lane, axis=1, keepdims=True)
            rmin_ref[sl, :] = jax.lax.bitcast_convert_type(
                rpk & ~_LOW_MASK, jnp.float32)
            rarg_ref[sl, :] = rpk & _LOW_MASK

            # per-x (y index over sublanes): the GLOBAL y index fits the
            # low bits (m_pad <= 2048), so the cross-tile carry is one
            # integer min of packed values
            sub = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0) + j * tm
            cpk_t = jnp.min((bits & ~_LOW_MASK) | sub, axis=0,
                            keepdims=True)
            return jnp.minimum(cpk, cpk_t)

        init = jax.lax.bitcast_convert_type(
            jnp.full((1, n_lanes), _BIG, jnp.float32), jnp.int32) | _LOW_MASK
        cpk = jax.lax.fori_loop(0, n_tiles, body, init)
        cmin_ref[:] = jax.lax.bitcast_convert_type(cpk & ~_LOW_MASK,
                                                   jnp.float32)
        cidx_ref[:] = cpk & _LOW_MASK
    else:
        def body(j, carry):
            cmin, cidx = carry                         # [1, N] running
            sl, d = dist_tile(j)

            # per-y (x index over lanes): finished within this tile
            rmin_t = jnp.min(d, axis=1, keepdims=True)
            lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            rarg_t = jnp.min(jnp.where(d <= rmin_t, lane, jnp.int32(2**30)),
                             axis=1, keepdims=True)
            rmin_ref[sl, :] = jnp.maximum(rmin_t, 0.0)
            rarg_ref[sl, :] = rarg_t

            # per-x (y index over sublanes): cross-tile running min
            cmin_t = jnp.min(d, axis=0, keepdims=True)
            sub = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
            carg_t = jnp.min(jnp.where(d <= cmin_t, sub, jnp.int32(2**30)),
                             axis=0, keepdims=True) + j * tm
            better = cmin_t < cmin
            return (jnp.where(better, cmin_t, cmin),
                    jnp.where(better, carg_t, cidx))

        init = (jnp.full((1, n_lanes), _BIG, jnp.float32),
                jnp.zeros((1, n_lanes), jnp.int32))
        cmin, cidx = jax.lax.fori_loop(0, n_tiles, body, init)
        cmin_ref[:] = jnp.maximum(cmin, 0.0)
        cidx_ref[:] = cidx


@functools.partial(jax.jit, static_argnames=(
    "mlp_scale", "tm", "interpret", "mxu_dist", "packed", "motion",
    "rotation_format", "nonrigid", "model"))
def _fwd_sweep_call(freq, xt_pad, xbig, yc_pad, ysqb, params_t,
                    mlp_scale: float, tm: int, interpret: bool,
                    mxu_dist: bool = False, packed: bool = False,
                    motion: str = "SE3",
                    rotation_format: str = "axis_angle",
                    nonrigid: bool = False, gate=None,
                    model: str = "ndp"):
    n_pad = xt_pad.shape[1]
    m_pad = yc_pad.shape[0]
    np_ = len(params_t)
    n_out = 6 if nonrigid else 5
    if gate is None:
        gate = jnp.zeros((1, 1), jnp.float32)
    kernel = functools.partial(_fwd_sweep_kernel, mlp_scale=mlp_scale,
                               tm=tm, m_pad=m_pad, mxu_dist=mxu_dist,
                               packed=packed, motion=motion,
                               rotation_format=rotation_format,
                               nonrigid=nonrigid, np_=np_, model=model)
    if interpret:
        in_specs = [pl.BlockSpec()] * (6 + np_)
        out_specs = [pl.BlockSpec()] * n_out
    else:
        in_specs = ([pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)] * 2
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                    * (4 + np_))
        out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out
    out_shape = [
        jax.ShapeDtypeStruct((3, n_pad), jnp.float32),   # warped
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),   # cmin (per-x)
        jax.ShapeDtypeStruct((1, n_pad), jnp.int32),     # cidx (per-x)
        jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),   # rmin (per-y)
        jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),     # rarg (per-y)
    ]
    if nonrigid:
        out_shape.append(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32))  # nr
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
        cost_estimate=None if interpret else pl.CostEstimate(
            flops=2 * n_pad * m_pad * 7,
            bytes_accessed=(n_pad * 8 + m_pad * 8) * 4,
            transcendentals=2 * 3 * n_pad,
        ),
    )(freq, gate, xt_pad, xbig, yc_pad, ysqb, *params_t)


# ---------------------------------------------------------------------------
# Warp-only kernel (temporal-coherence sweep reuse: cheap sub-iterations)
# ---------------------------------------------------------------------------

def _warp_only_kernel(freq_ref, gate_ref, xt_ref, *refs, mlp_scale: float,
                      motion: str, rotation_format: str, nonrigid: bool,
                      np_: int, model: str):
    """Kernel 1 minus the sweep: just the level warp in [3, N] layout.

    Used by the sweep-reuse schedule (``run_fused_level`` with
    ``resweep_every >= 2``): cheap sub-iterations re-warp the points but
    update the 1-NN association with a local KNN-graph walk in XLA
    instead of the O(N·M) dual sweep."""
    p_refs = refs[:np_]
    if nonrigid:
        warped_ref, nr_ref = refs[np_:]
    else:
        (warped_ref,) = refs[np_:]
    out = _fwd_model_t(model, xt_ref[:], freq_ref[0, 0],
                       [r[:] for r in p_refs], mlp_scale=mlp_scale,
                       motion=motion, rotation_format=rotation_format,
                       nonrigid=nonrigid,
                       gate=gate_ref[0, 0] if nonrigid else None)
    if nonrigid:
        warped, nr = out
        nr_ref[:] = nr
    else:
        warped = out
    warped_ref[:] = warped


@functools.partial(jax.jit, static_argnames=(
    "mlp_scale", "interpret", "motion", "rotation_format", "nonrigid",
    "model"))
def _warp_only_call(freq, xt_pad, params_t, mlp_scale: float,
                    interpret: bool, motion: str = "SE3",
                    rotation_format: str = "axis_angle",
                    nonrigid: bool = False, gate=None, model: str = "ndp"):
    n_pad = xt_pad.shape[1]
    np_ = len(params_t)
    if gate is None:
        gate = jnp.zeros((1, 1), jnp.float32)
    kernel = functools.partial(_warp_only_kernel, mlp_scale=mlp_scale,
                               motion=motion,
                               rotation_format=rotation_format,
                               nonrigid=nonrigid, np_=np_, model=model)
    n_out = 2 if nonrigid else 1
    if interpret:
        in_specs = [pl.BlockSpec()] * (3 + np_)
        out_specs = [pl.BlockSpec()] * n_out
    else:
        in_specs = ([pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)] * 2
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + np_))
        out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out
    out_shape = [jax.ShapeDtypeStruct((3, n_pad), jnp.float32)]
    if nonrigid:
        out_shape.append(jax.ShapeDtypeStruct((1, n_pad), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(freq, gate, xt_pad, *params_t)
    return (outs[0], outs[1]) if nonrigid else (outs[0], None)


def _knn_table(pts: Array, big: Array, c: int) -> tuple[Array, Array]:
    """[P, c] indices of each row's c nearest rows (self included at
    column 0) plus the nearest-OTHER squared distance per row.

    ``big`` carries +BIG for invalid rows so they never appear as
    candidates. One O(P^2) pass, built once per level — amortized over
    the hundreds of cheap sub-iterations that walk it."""
    sq = jnp.sum(pts * pts, axis=-1)
    d = sq[:, None] + sq[None, :] - 2.0 * (pts @ pts.T)
    d = jnp.maximum(d, 0.0) + big[None, :]
    neg, idx = jax.lax.top_k(-d, min(c, pts.shape[0]))
    nn_other = -neg[:, 1] if neg.shape[1] > 1 else jnp.zeros_like(neg[:, 0])
    return idx.astype(jnp.int32), nn_other


# ---------------------------------------------------------------------------
# XLA glue: O(N) loss + gradient wrt warped points
# ---------------------------------------------------------------------------

def _chamfer_glue(warped_t: Array, cidx: Array, rarg: Array, yc: Array,
                  x_valid: Array, y_valid: Array, x_len: Array, y_len: Array,
                  trunc: float) -> tuple[Array, Array]:
    """Loss + analytic grad wrt warped, from the sweep's indices.

    Exactly ``truncated_chamfer``'s value and its gradient wrt the query
    cloud (``ops/chamfer._gathered_sum`` incl. the double-where sqrt
    guard and the 1e-16 floor); the target is constant, matching the
    solver (`solve/registration.py` chamfer closure).
    """
    w = warped_t.T                                   # [N, 3]
    y_nn = yc[cidx[0]]                               # [N, 3]
    sq_x = jnp.sum((w - y_nn) ** 2, axis=-1)
    keep_x = (sq_x < trunc) & x_valid
    safe_x = jnp.where(keep_x, jnp.maximum(sq_x, _FLOOR), 1.0)
    root_x = jnp.sqrt(safe_x)
    loss_x = jnp.sum(jnp.where(keep_x, root_x, 0.0))

    x_nn = w[rarg[:, 0]]                             # [M, 3]
    sq_y = jnp.sum((yc - x_nn) ** 2, axis=-1)
    keep_y = (sq_y < trunc) & y_valid
    safe_y = jnp.where(keep_y, jnp.maximum(sq_y, _FLOOR), 1.0)
    root_y = jnp.sqrt(safe_y)
    loss_y = jnp.sum(jnp.where(keep_y, root_y, 0.0))

    loss = loss_x / x_len + loss_y / y_len

    gx = jnp.where(keep_x, 1.0 / root_x, 0.0)[:, None] * (w - y_nn) / x_len
    gy = jnp.where(keep_y, 1.0 / root_y, 0.0)[:, None] * (x_nn - yc) / y_len
    g = gx.at[rarg[:, 0]].add(gy)
    return loss, g.T


# ---------------------------------------------------------------------------
# Kernel 2: vjp backward (recomputed forward) + Adam + done gate
# ---------------------------------------------------------------------------

def _bwd_adam_kernel(freq_ref, step_ref, done_ref, gate_ref, xt_ref,
                     g_ref, gnr_ref, *refs, mlp_scale: float, lr: float,
                     b1: float, b2: float, eps: float, motion: str,
                     rotation_format: str, nonrigid: bool, np_: int,
                     model: str):
    """Grid over N lane-tiles: per tile, jax.vjp of the recomputed warp
    accumulates parameter gradients into VMEM scratch; the LAST tile
    applies the optax-exact Adam update (bias correction by applied-step
    count) gated by ``done`` (1.0 = hold params/moments, the solver's
    no-step-after-break semantics). With ``nonrigid`` the vjp takes the
    (warped, nonrigidity) cotangent pair — ``gnr`` carries the BCE reg
    gradient from the glue."""
    p_refs = refs[:np_]
    m_refs = refs[np_:2 * np_]
    v_refs = refs[2 * np_:3 * np_]
    out_refs = refs[3 * np_:6 * np_]   # newp ; newm ; newv
    g_scr = refs[6 * np_:]
    i = pl.program_id(0)
    n_grid = pl.num_programs(0)
    xt = xt_ref[:]
    freq = freq_ref[0, 0]

    def f(*params):
        return _fwd_model_t(model, xt, freq, params, mlp_scale=mlp_scale,
                            motion=motion,
                            rotation_format=rotation_format,
                            nonrigid=nonrigid,
                            gate=gate_ref[0, 0] if nonrigid else None)

    _, vjp = jax.vjp(f, *[r[:] for r in p_refs])
    grads = vjp((g_ref[:], gnr_ref[:]) if nonrigid else g_ref[:])

    @pl.when(i == 0)
    def _():
        for ref, g in zip(g_scr, grads):
            ref[:] = g

    @pl.when(i > 0)
    def _():
        for ref, g in zip(g_scr, grads):
            ref[:] = ref[:] + g

    @pl.when(i == n_grid - 1)
    def _():
        # optax.adam: mu/nu EMA, bias correction with count+1, eps_root=0.
        # b**t via exp(t*ln b) with a Python-constant log: Mosaic cannot
        # legalize math.powf on a traced scalar exponent.
        t = step_ref[0, 0] + 1.0
        bc1 = 1.0 - jnp.exp(t * math.log(b1))
        bc2 = 1.0 - jnp.exp(t * math.log(b2))
        hold = done_ref[0, 0] > 0.5
        newp = out_refs[:np_]
        newm = out_refs[np_:2 * np_]
        newv = out_refs[2 * np_:]
        for pr, mr, vr, npr, nmr, nvr, gs in zip(
                p_refs, m_refs, v_refs, newp, newm, newv, g_scr):
            g = gs[:]
            m2 = b1 * mr[:] + (1.0 - b1) * g
            v2 = b2 * vr[:] + (1.0 - b2) * (g * g)
            upd = -lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            npr[:] = jnp.where(hold, pr[:], pr[:] + upd)
            nmr[:] = jnp.where(hold, mr[:], m2)
            nvr[:] = jnp.where(hold, vr[:], v2)


@functools.partial(jax.jit, static_argnames=(
    "mlp_scale", "lr", "b1", "b2", "eps", "tn", "interpret", "motion",
    "rotation_format", "nonrigid", "model"))
def _bwd_adam_call(freq, step, done, xt_pad, g_t, params_t, m_t, v_t,
                   mlp_scale: float, lr: float, b1: float, b2: float,
                   eps: float, tn: int, interpret: bool,
                   motion: str = "SE3",
                   rotation_format: str = "axis_angle",
                   nonrigid: bool = False, gate=None, g_nr=None,
                   model: str = "ndp"):
    n_pad = xt_pad.shape[1]
    tn = min(tn, n_pad)
    grid = (n_pad // tn,)
    if gate is None:
        gate = jnp.zeros((1, 1), jnp.float32)
    if g_nr is None:
        g_nr = jnp.zeros((1, n_pad), jnp.float32)
    kernel = functools.partial(_bwd_adam_kernel, mlp_scale=mlp_scale,
                               lr=lr, b1=b1, b2=b2, eps=eps, motion=motion,
                               rotation_format=rotation_format,
                               nonrigid=nonrigid, np_=len(params_t),
                               model=model)
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    smem = {} if interpret else {"memory_space": pltpu.SMEM}

    def const(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i: (0,) * nd, **mem)

    in_specs = (
        [pl.BlockSpec((1, 1), lambda i: (0, 0), **smem)] * 4   # freq/step/
        #                                                        done/gate
        + [pl.BlockSpec((3, tn), lambda i: (0, i), **mem)]     # xt
        + [pl.BlockSpec((3, tn), lambda i: (0, i), **mem)]     # g
        + [pl.BlockSpec((1, tn), lambda i: (0, i), **mem)]     # g_nr
        + [const(a) for a in params_t + m_t + v_t]
    )
    out_specs = [const(a) for a in params_t * 3]
    out_shape = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                 for a in params_t * 3]
    scratch = [pltpu.VMEM(a.shape, jnp.float32) for a in params_t]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(freq, step, done, gate, xt_pad, g_t, g_nr, *params_t, *m_t, *v_t)
    n = len(params_t)
    return list(outs[:n]), list(outs[n:2 * n]), list(outs[2 * n:])


# ---------------------------------------------------------------------------
# Parameter plumbing: level param dict <-> transposed tensor list
# ---------------------------------------------------------------------------

def params_to_t(p: dict) -> list[Array]:
    """One level's param dict -> the transposed tensors of
    ``_forward_math_t`` (same plumbing as ``fused_level_warp_t``):
    9 for SE3, +2 (scale head) for Sim3, -2 (no rot head) for sflow."""
    w_in = p["input"]["w"].reshape(3, 2, -1)
    t = [
        w_in[:, 0].T, w_in[:, 1].T, p["input"]["b"].reshape(-1, 1),
        jnp.swapaxes(p["hidden"]["w"], -1, -2), p["hidden"]["b"][..., None],
    ]
    if "rot" in p:
        t += [p["rot"]["w"].T, p["rot"]["b"].reshape(-1, 1)]
    t += [p["trn"]["w"].T, p["trn"]["b"].reshape(-1, 1)]
    if "scale" in p:
        t += [p["scale"]["w"].T, p["scale"]["b"].reshape(-1, 1)]
    if "nr" in p:
        t += [p["nr"]["w"].T, p["nr"]["b"].reshape(-1, 1)]
    return t


def t_to_params(t: list[Array], motion: str | None = None,
                nonrigid: bool = False) -> dict:
    """Inverse of :func:`params_to_t` (exact: transposes/reshapes only).
    Without ``motion`` the layout is recovered from the tensor count
    (7 sflow / 9 SE3 / 11 Sim3, no nr head — counts are ambiguous once
    ``nonrigid`` params exist, so nonrigid callers must pass both)."""
    t = list(t)
    out = {}
    if nonrigid:
        b_nr = t.pop()
        w_nr_t = t.pop()
        out["nr"] = {"w": w_nr_t.T, "b": b_nr[:, 0]}
    has_rot = (motion != "sflow") if motion is not None else len(t) >= 9
    has_scl = (motion == "Sim3") if motion is not None else len(t) == 11
    (w_sin_t, w_cos_t, b_in, wh_t, bh, *rest) = t
    w_in = jnp.stack([w_sin_t.T, w_cos_t.T], axis=1)   # [3, 2, w]
    out["input"] = {"w": w_in.reshape(6, -1), "b": b_in[:, 0]}
    out["hidden"] = {"w": jnp.swapaxes(wh_t, -1, -2), "b": bh[..., 0]}
    if has_rot:
        w_rot_t, b_rot, *rest = rest
        out["rot"] = {"w": w_rot_t.T, "b": b_rot[:, 0]}
    w_trn_t, b_trn, *t_scl = rest
    out["trn"] = {"w": w_trn_t.T, "b": b_trn[:, 0]}
    if has_scl:
        w_scl_t, b_scl = t_scl
        out["scale"] = {"w": w_scl_t.T, "b": b_scl[:, 0]}
    return out


def _supports_warp(pcfg) -> bool:
    return (pcfg.motion in ("SE3", "Sim3", "sflow")
            and pcfg.rotation_format in ("axis_angle", "euler",
                                         "quaternion", "6D")
            and pcfg.depth >= 2)


def supports_fused_iteration(pcfg, w_reg: float, n_ldmk: int) -> bool:
    """The two-kernel path covers every chamfer-mode NDP config:
    SE3/Sim3/sflow motion, all four reference rotation formats (the
    benchmark NDP.yaml and the Sim3 shape-transfer demo included), the
    nonrigidity branch + BCE reg (w_reg > 0), >=1 hidden layer. The
    w_reg > 0 objective needs the nr head (``solver_from_config`` sets
    ``nonrigidity_est`` from w_reg, matching reference
    ``registration.py:138``)."""
    return (_supports_warp(pcfg) and n_ldmk == 0
            and (w_reg == 0 or pcfg.nonrigidity_est))


def supports_fused_iteration_ldmk(pcfg, w_reg: float, n_ldmk: int,
                                  w_cd: float) -> bool:
    """The landmark paths cover the LNDP level loop (``w_reg == 0`` —
    ``config/LNDP.yaml``): ``w_cd == 0`` takes the one-kernel pure-L2
    iteration (:func:`run_fused_level_ldmk`); ``w_cd > 0`` takes the
    two-kernel path with the landmark term folded into the glue
    (``run_fused_level(n_ldmk=...)``). Same warp-chain coverage as
    :func:`supports_fused_iteration`."""
    return (_supports_warp(pcfg) and not pcfg.nonrigidity_est
            and w_reg == 0 and n_ldmk > 0)


# ---------------------------------------------------------------------------
# The compiled level loop (mirrors solve/loop.run_adam_loop semantics)
# ---------------------------------------------------------------------------

# Sweep-kernel micro-knobs (A/B harness: scripts/ab_fused_sweep.py):
# mxu computes the [tm, N] cross term as one bf16x3 matmul instead of
# ~7 VPU broadcast passes; packed uses the ops/knn v3 one-integer-min
# selection (auto-gated to n_pad/m_pad <= 2048 — 11 index bits).
# On-chip bench A/B (2026-08-18, median-of-3 through the full fused
# iteration, docs/PERFORMANCE.md round-3 session 3): packed 8.56 pairs/s
# vs 7.60 baseline (+13%, spread 0.006) => default ON; mxu 7.63 alone
# and 7.44 combined with packed (the bf16x3 matmul adds an MXU hop the
# VPU-bound sweep never pays back) => default OFF. Env overrides:
# DP_SWEEP_PACKED=0 disables, DP_SWEEP_MXU=1 enables.
_SWEEP_MXU_DIST = os.environ.get("DP_SWEEP_MXU", "0") == "1"
_SWEEP_PACKED = os.environ.get("DP_SWEEP_PACKED", "1") == "1"
# DP_SWEEP_TM=<int>: override the y-tile height. Bench A/Bs: packed
# tm=1024 8.74 pairs/s vs tm=512's 8.56 (2026-08-18), tm=2048 8.94 vs
# tm=1024's 8.72 (2026-08-19, identical lockstep trajectories — pure
# kernel speed), so the default budget is 2^22 working-set elements
# (16 MB f32 distance block + 16 MB packed int32 at n_pad=2048 —
# comfortably inside the 64 MB scoped-VMEM cap _compiler_params sets;
# Mosaic rejects true overflows at compile time).
_SWEEP_TM_ENV = int(os.environ.get("DP_SWEEP_TM", "0"))
# Temporal-coherence sweep reuse (VERDICT r3 #5): DP_SWEEP_REUSE=T runs
# one exact dual sweep per T iterations; the T-1 in-between iterations
# re-warp (warp-only kernel) and update the association with a 1-hop walk
# on precomputed KNN graphs, guarded by a drift bound (see
# run_fused_level). 0/1 = off (exact sweep every iteration).
_SWEEP_REUSE = int(os.environ.get("DP_SWEEP_REUSE", "0"))
_SWEEP_REUSE_C = int(os.environ.get("DP_SWEEP_REUSE_C", "8"))
_SWEEP_REUSE_DRIFT = float(os.environ.get("DP_SWEEP_REUSE_DRIFT", "1.0"))


def _tm_cap(tm: int, n_pad: int, m: int, budget: int = 1 << 22) -> int:
    """Clamp the y-tile height to the VMEM working-set budget (see the
    comment at the run_fused_level call site) and the target row count.

    A DP_SWEEP_TM env override is trusted past the working-set budget
    (only rounded down to the sublane multiple and clamped to the row
    count) so oversized tiles can be A/B'd; Mosaic's 64 MB scoped-VMEM
    check still rejects true overflows at compile time rather than
    silently mis-executing."""
    if _SWEEP_TM_ENV:
        return min(max(_SWEEP_TM_ENV // 8 * 8, 8), _round_up(max(m, 8), 8))
    tm = min(tm, max(8, (budget // n_pad) // 8 * 8))
    # Non-pow2 m > tm: m_pad = round_up(m, tm), so a large tile can pad
    # far past m (e.g. m=3000 @ tm=2048 -> m_pad=4096, +33% sweep rows).
    # Step tm down by halves while that strictly shrinks the padded row
    # count — ties keep the larger tile (fewer grid steps). Each step
    # re-rounds to the 8-row sublane multiple (a bare tm//2 of e.g. 408
    # gives 204, breaking the alignment every other path maintains).
    while tm > 8 and m > tm:
        nxt = max((tm // 2) // 8 * 8, 8)
        if nxt == tm or _round_up(m, nxt) >= _round_up(m, tm):
            break
        tm = nxt
    return min(tm, _round_up(max(m, 8), 8))


def _bce_zeros_row(nr: Array, valid: Array) -> Array:
    """``solve/registration._bce_zeros`` on a [1, N] nonrigidity row:
    BCE(nr, target=0) = -mean(log(1-nr)) over valid lanes, torch-style
    -100 clamp (reference ``registration.py:216-220``)."""
    log1mp = jnp.maximum(jnp.log1p(-nr[0]), -100.0)
    return -jnp.sum(jnp.where(valid, log1mp, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)


def run_fused_level(lvl_params: dict, pts: Array, pts_valid: Array,
                    t_sample: Array, t_valid: Array, level: Array,
                    pcfg, lcfg, trunc: float = 1e9,
                    tm: int = 2048, tn: int = 1024,
                    interpret: bool | None = None,
                    mxu_dist: bool | None = None,
                    packed: bool | None = None,
                    w_reg: float = 0.0,
                    n_ldmk: int = 0, tgt_ldmk: Array | None = None,
                    ldmk_valid: Array | None = None, w_cd: float = 1.0,
                    resweep_every: int | None = None,
                    resweep_c: int | None = None,
                    resweep_drift: float | None = None):
    """Adam-optimize one pyramid level with the two-kernel iteration.

    Drop-in for the unfused ``_solve_level`` body: same 3-way early
    stop, same pre-step warped-points handoff, same optax Adam math.
    With ``pcfg.nonrigidity_est`` the warp applies the level>0
    nonrigidity gate in-kernel and the loss adds the ``w_reg``-weighted
    BCE-vs-zeros term (its exact-autodiff gradient rides into kernel 2
    as the nr cotangent). With ``n_ldmk > 0`` (landmark + chamfer mode,
    reference ``registration.py:187-216``) ``pts`` is [ldmk ; sample]:
    the first ``n_ldmk`` rows carry the masked mean-squared landmark
    term while the chamfer term sees only the sample rows (landmark
    rows are +BIG-masked out of both sweep directions) scaled by
    ``w_cd`` and truncated at ``trunc``. Returns (updated level params
    dict, warped pts [N, 3], stats {iters, loss}).

    ``resweep_every`` = T >= 2 enables temporal-coherence sweep reuse:
    each while-loop step runs ONE exact dual-sweep iteration followed by
    T-1 cheap iterations (warp-only kernel + a 1-hop argmin walk on
    precomputed KNN graphs — the target cloud is static so its graph is
    exact forever; the source graph is built in source space, which a
    smooth warp preserves). Warps move ~1e-3/step near convergence, so
    the argmin rarely leaves the current candidate's ``resweep_c``-
    neighborhood between exact sweeps. A drift bound makes it safe: once
    the max displacement since the last exact sweep exceeds
    ``resweep_drift`` x the target's median NN spacing, the remaining
    cheap sub-iterations HOLD (no param update, no ``it`` advance) until
    the next exact sweep — stale association can then only ever cost
    wall-clock, never correctness. The schedule is static (no lax.cond),
    so it survives vmap without executing both branches. T in {0, 1}
    keeps the one-exact-iteration-per-step path.
    """
    if interpret is None:
        interpret = not _on_tpu()
    if resweep_every is None:
        resweep_every = _SWEEP_REUSE
    if resweep_c is None:
        resweep_c = _SWEEP_REUSE_C
    if resweep_drift is None:
        resweep_drift = _SWEEP_REUSE_DRIFT
    n = pts.shape[0]
    m = t_sample.shape[0]
    n_pad = _round_up(max(n, 128), 128)
    # VMEM: the [tm, n_pad] distance block (+ its iota/packing
    # temporaries) dominates kernel 1; cap tm so tm * n_pad stays at the
    # bench-validated 2^22-element working set (tm=2048 @ n_pad=2048,
    # 16 MB f32 per live block — bench 8.94 vs tm=1024's 8.72 pairs/s,
    # 2026-08-19). Larger clouds (e.g. the 6000-sample shape-transfer
    # demo) step tm down instead of overflowing scoped VMEM.
    tm = _tm_cap(tm, n_pad, m)
    m_pad = _round_up(max(m, tm), tm)
    if mxu_dist is None:
        mxu_dist = _SWEEP_MXU_DIST
    if packed is None:
        packed = _SWEEP_PACKED
    packed = packed and n_pad <= 2048 and m_pad <= 2048

    xt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
        pts.astype(jnp.float32).T)
    row_valid = jnp.zeros((n_pad,), bool).at[:n].set(pts_valid)
    # chamfer sees only the sample rows: landmark rows are excluded from
    # both sweep directions (+BIG) and from the glue's keep mask,
    # matching chamfer(warped[n_ldmk:], ...) in the unfused loss
    xv = row_valid & (jnp.arange(n_pad) >= n_ldmk)
    xbig = jnp.where(xv, 0.0, _BIG)[None, :]
    yc_pad = jnp.zeros((m_pad, 3), jnp.float32).at[:m].set(
        t_sample.astype(jnp.float32))
    yv = jnp.zeros((m_pad,), bool).at[:m].set(t_valid)
    ysqb = jnp.where(yv, jnp.sum(yc_pad * yc_pad, axis=-1), _BIG)[:, None]
    x_len = jnp.maximum(jnp.sum(xv), 1).astype(jnp.float32)
    y_len = jnp.maximum(jnp.sum(yv), 1).astype(jnp.float32)
    if n_ldmk > 0:
        lmask = jnp.zeros((1, n_pad), jnp.float32).at[0, :n_ldmk].set(
            ldmk_valid.astype(jnp.float32))
        lcount = jnp.maximum(jnp.sum(lmask), 1.0)
        ltgt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :n_ldmk].set(
            tgt_ldmk.astype(jnp.float32).T)
        cham_w = w_cd
    else:
        cham_w = 1.0

    freq = jnp.exp2(jnp.asarray(level, jnp.float32) + 1.0 + pcfg.k0)
    freq = freq.reshape(1, 1)
    p0 = params_to_t(lvl_params)
    zeros = [jnp.zeros_like(a) for a in p0]
    mlp_scale = float(pcfg.mlp_scale)

    def cond(c):
        return (c["it"] < lcfg.iters) & jnp.logical_not(c["done"])

    motion = pcfg.motion
    rotation_format = pcfg.rotation_format
    nonrigid = bool(pcfg.nonrigidity_est)
    gate = ((jnp.asarray(level, jnp.int32) > 0)
            .astype(jnp.float32).reshape(1, 1)) if nonrigid else None

    def assoc_full(p_list):
        """Exact iteration front half: warp + O(N·M) dual argmin sweep."""
        outs = _fwd_sweep_call(
            freq, xt_pad, xbig, yc_pad, ysqb, p_list,
            mlp_scale=mlp_scale, tm=tm, interpret=interpret,
            mxu_dist=mxu_dist, packed=packed, motion=motion,
            rotation_format=rotation_format, nonrigid=nonrigid, gate=gate)
        warped_t, _, cidx, _, rarg = outs[:5]
        return warped_t, (outs[5] if nonrigid else None), cidx, rarg

    def step_update(c, warped_t, nr_row, cidx, rarg, halt):
        """Back half of one iteration: loss glue + early-stop book-keeping
        + kernel-2 backward/Adam. ``halt`` = this sub-iteration must be a
        no-op (already done / past the iteration cap / stale association
        under sweep reuse); with ``halt`` = const False this reproduces
        the pre-reuse loop body exactly."""
        loss, g_t = _chamfer_glue(warped_t, cidx, rarg, yc_pad, xv, yv,
                                  x_len, y_len, trunc)
        if n_ldmk > 0:
            # masked mean-squared landmark term over the first n_ldmk
            # rows + w_cd-scaled chamfer (reference registration.py:205-216)
            diff = (warped_t - ltgt_pad) * lmask
            loss = jnp.sum(diff * diff) / lcount + cham_w * loss
            g_t = (2.0 / lcount) * diff + cham_w * g_t
        g_nr = None
        if nonrigid:
            # loss += where(level>0, w_reg * BCE(nr, 0), 0); exact
            # autodiff gradient wrt nr goes to kernel 2 as a cotangent
            # (reference registration.py:216-220)
            # mask = ALL valid rows (unfused uses pts_valid, not the
            # chamfer-only sample mask — they only differ when landmarks
            # are present, which the gates keep off the nonrigid path)
            reg, vjp_nr = jax.vjp(
                lambda q: _bce_zeros_row(q, row_valid), nr_row)
            w_eff = gate[0, 0] * w_reg
            loss = loss + w_eff * reg
            (g_nr,) = vjp_nr(w_eff)
        run = jnp.logical_not(halt)
        small = loss < lcfg.loss_eps
        plateau = jnp.abs(c["loss_prev"] - loss) \
            < c["loss_prev"] * lcfg.break_threshold_ratio
        counter = c["counter"] + (plateau & run).astype(jnp.int32)
        done = jnp.where(run, small | (counter >= lcfg.max_break_count),
                         c["done"])
        hold = halt | done
        newp, newm, newv = _bwd_adam_call(
            freq, c["applied"].astype(jnp.float32).reshape(1, 1),
            hold.astype(jnp.float32).reshape(1, 1), xt_pad, g_t,
            c["p"], c["m"], c["v"], mlp_scale=mlp_scale, lr=lcfg.lr,
            b1=0.9, b2=0.999, eps=1e-8, tn=tn, interpret=interpret,
            motion=motion, rotation_format=rotation_format,
            nonrigid=nonrigid, gate=gate, g_nr=g_nr)
        return {
            "p": newp, "m": newm, "v": newv,
            "loss_prev": jnp.where(hold, c["loss_prev"], loss),
            "counter": counter,
            "done": done,
            "it": c["it"] + run.astype(jnp.int32),
            "applied": c["applied"] + jnp.where(hold, 0, 1),
            "aux": jnp.where(halt, c["aux"], warped_t),
            "loss": jnp.where(halt, c["loss"], loss),
        }

    init = {
        "p": p0, "m": zeros, "v": [jnp.zeros_like(a) for a in p0],
        "loss_prev": jnp.float32(1e6),
        "counter": jnp.int32(0),
        "done": jnp.bool_(False),
        "it": jnp.int32(0),
        "applied": jnp.int32(0),
        "aux": xt_pad,
        "loss": jnp.float32(jnp.inf),
    }

    if resweep_every >= 2:
        out = _reuse_loop(cond, assoc_full, step_update, init,
                          freq=freq, xt_pad=xt_pad, xbig=xbig,
                          yc_pad=yc_pad, yv=yv, mlp_scale=mlp_scale,
                          interpret=interpret, motion=motion,
                          rotation_format=rotation_format,
                          nonrigid=nonrigid, gate=gate, lcfg=lcfg,
                          resweep_every=resweep_every,
                          resweep_c=resweep_c,
                          resweep_drift=resweep_drift)
    else:
        def body(c):
            warped_t, nr_row, cidx, rarg = assoc_full(c["p"])
            return step_update(c, warped_t, nr_row, cidx, rarg,
                               halt=jnp.bool_(False))

        out = jax.lax.while_loop(cond, body, init)
    stats = {"iters": out["it"], "loss": out["loss"]}
    warped = out["aux"].T[:n]
    return (t_to_params(out["p"], motion=motion, nonrigid=nonrigid),
            warped, stats)


def _reuse_loop(cond, assoc_full, step_update, init, *, freq, xt_pad, xbig,
                yc_pad, yv, mlp_scale, interpret, motion, rotation_format,
                nonrigid, gate, lcfg, resweep_every: int, resweep_c: int,
                resweep_drift: float):
    """The sweep-reuse schedule: while_loop over super-iterations of
    [1 exact iteration ; scan of T-1 cheap iterations].

    The schedule is STATIC — no lax.cond — so vmapped batches never pay
    for both branches. Correctness envelope: cheap iterations use the
    exact per-candidate distances of a walked association; the walk can
    only lag the true argmin (loss upper bound), and the drift bound
    turns sub-iterations into holds before the lag can grow past one
    graph hop per step. Exactness is restored at every super-iteration
    head.
    """
    n_pad = xt_pad.shape[1]
    m_pad = yc_pad.shape[0]
    # KNN graphs, once per level: y's in target space (static cloud =
    # exact forever), x's in source space (a smooth warp preserves
    # neighborhoods). Invalid rows (+BIG) never appear as candidates;
    # column 0 is self, so the walk's candidate set always contains the
    # current argmin (monotone within the candidate set).
    big_y = jnp.where(yv, 0.0, _BIG)
    knn_y, nn_y = _knn_table(yc_pad, big_y, resweep_c)
    knn_x, _ = _knn_table(xt_pad.T, xbig[0], resweep_c)
    # drift bound: resweep_drift x the target's median valid-NN spacing.
    # Once points have moved further than this since the last exact
    # sweep, a 1-hop-per-step walk may no longer track the true argmin.
    d1 = jnp.sqrt(jnp.maximum(jnp.where(yv, nn_y, jnp.inf), 0.0))
    n_valid = jnp.maximum(jnp.sum(yv), 1)
    med = jnp.take(jnp.sort(d1), (n_valid - 1) // 2)
    bound = (jnp.float32(resweep_drift) * med if resweep_drift > 0
             else jnp.float32(jnp.inf))

    def cheap_step(cc, _):
        warped_t, nr_row = _warp_only_call(
            freq, xt_pad, cc["p"], mlp_scale=mlp_scale,
            interpret=interpret, motion=motion,
            rotation_format=rotation_format, nonrigid=nonrigid,
            gate=gate)
        w = warped_t.T                                     # [n_pad, 3]
        # per-x walk: candidates = KNN of the current NN in target space
        cand = knn_y[cc["cidx"][0]]                        # [n_pad, c]
        d = jnp.sum((w[:, None, :] - yc_pad[cand]) ** 2, axis=-1) \
            + big_y[cand]
        j = jnp.argmin(d, axis=1)
        cidx = jnp.take_along_axis(cand, j[:, None], axis=1)[:, 0][None, :]
        # per-y walk: candidates = source-space KNN of the current NN
        candx = knn_x[cc["rarg"][:, 0]]                    # [m_pad, c]
        dx = jnp.sum((yc_pad[:, None, :] - w[candx]) ** 2, axis=-1) \
            + xbig[0][candx]
        jx = jnp.argmin(dx, axis=1)
        rarg = jnp.take_along_axis(candx, jx[:, None], axis=1)  # [m_pad,1]
        # drift over sweep-participating lanes only (xbig==0): padded /
        # invalid / landmark rows also move under the level warp and a
        # max over them would trip the stale hold on motion the chamfer
        # association never sees
        drift = jnp.max(jnp.where(xbig == 0.0,
                                  jnp.abs(warped_t - cc["wref"]), 0.0))
        stale = cc["stale"] | (drift > bound)
        halt = cc["done"] | (cc["it"] >= lcfg.iters) | stale
        c2 = step_update(cc, warped_t, nr_row, cidx, rarg, halt)
        return {**c2, "cidx": cidx, "rarg": rarg, "wref": cc["wref"],
                "stale": stale}, None

    def super_body(c):
        warped_t, nr_row, cidx, rarg = assoc_full(c["p"])
        c2 = step_update(c, warped_t, nr_row, cidx, rarg,
                         halt=c["done"] | (c["it"] >= lcfg.iters))
        c2 = {**c2, "cidx": cidx, "rarg": rarg, "wref": warped_t,
              "stale": jnp.bool_(False)}
        c3, _ = jax.lax.scan(cheap_step, c2, None,
                             length=resweep_every - 1)
        return c3

    init = dict(init,
                cidx=jnp.zeros((1, n_pad), jnp.int32),
                rarg=jnp.zeros((m_pad, 1), jnp.int32),
                wref=xt_pad, stale=jnp.bool_(False))
    return jax.lax.while_loop(cond, super_body, init)


# ---------------------------------------------------------------------------
# One-kernel landmark iteration (LNDP level loop, w_cd = 0)
# ---------------------------------------------------------------------------

def _ldmk_iter_kernel(freq_ref, lprev_ref, cnt_ref, app_ref, count_ref,
                      xt_ref, tgt_ref, mask_ref, *refs, mlp_scale: float,
                      lr: float, b1: float, b2: float, eps: float,
                      motion: str, rotation_format: str,
                      max_break: int, thr_ratio: float, loss_eps: float):
    """The ENTIRE landmark-mode solver iteration in one launch.

    With ``w_cd == 0`` (``config/LNDP.yaml``) the level loop optimizes the
    masked mean-squared landmark distance over only the ~landmark rows —
    a few hundred points, so the unfused path is pure launch latency
    (~25 dispatches for <1 MFLOP). Here: forward warp, loss, the 3-way
    early-stop decision (reference ``registration.py:219-235``), the
    closed-form gradient wrt warped (``2*(w - tgt)*mask/count``), jax.vjp
    through the recomputed chain, and the done-gated optax-Adam update all
    run in a single kernel; only (1,1) scalars + the warped rows leave.
    """
    np_ = _n_params(motion)
    p_refs = refs[:np_]
    m_refs = refs[np_:2 * np_]
    v_refs = refs[2 * np_:3 * np_]
    out_p = refs[3 * np_:4 * np_]
    out_m = refs[4 * np_:5 * np_]
    out_v = refs[5 * np_:6 * np_]
    warped_ref, loss_ref, cnt2_ref, done_ref = refs[6 * np_:]
    xt = xt_ref[:]
    freq = freq_ref[0, 0]

    def f(*params):
        return _forward_math_t(xt, freq, *params, mlp_scale=mlp_scale,
                               motion=motion,
                               rotation_format=rotation_format)

    warped, vjp = jax.vjp(f, *[r[:] for r in p_refs])
    warped_ref[:] = warped
    count = count_ref[0, 0]
    diff = (warped - tgt_ref[:]) * mask_ref[:]         # [3, N], masked
    loss = jnp.sum(diff * diff) / count
    loss_ref[0, 0] = loss

    loss_prev = lprev_ref[0, 0]
    small = loss < loss_eps
    plateau = jnp.abs(loss_prev - loss) < loss_prev * thr_ratio
    counter = cnt_ref[0, 0] + plateau.astype(jnp.float32)
    done = small | (counter >= max_break)
    cnt2_ref[0, 0] = counter
    done_ref[0, 0] = done.astype(jnp.float32)

    grads = vjp((2.0 / count) * diff)
    t = app_ref[0, 0] + 1.0
    bc1 = 1.0 - jnp.exp(t * math.log(b1))
    bc2 = 1.0 - jnp.exp(t * math.log(b2))
    for pr, mr, vr, npr, nmr, nvr, g in zip(
            p_refs, m_refs, v_refs, out_p, out_m, out_v, grads):
        m2 = b1 * mr[:] + (1.0 - b1) * g
        v2 = b2 * vr[:] + (1.0 - b2) * (g * g)
        upd = -lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
        npr[:] = jnp.where(done, pr[:], pr[:] + upd)
        nmr[:] = jnp.where(done, mr[:], m2)
        nvr[:] = jnp.where(done, vr[:], v2)


@functools.partial(jax.jit, static_argnames=(
    "mlp_scale", "lr", "b1", "b2", "eps", "interpret", "motion",
    "rotation_format", "max_break", "thr_ratio", "loss_eps"))
def _ldmk_iter_call(freq, loss_prev, counter, applied, count, xt_pad,
                    tgt_pad, mask, params_t, m_t, v_t, *, mlp_scale: float,
                    lr: float, b1: float, b2: float, eps: float,
                    interpret: bool, motion: str, rotation_format: str,
                    max_break: int, thr_ratio: float, loss_eps: float):
    n_pad = xt_pad.shape[1]
    np_ = len(params_t)
    kernel = functools.partial(
        _ldmk_iter_kernel, mlp_scale=mlp_scale, lr=lr, b1=b1, b2=b2,
        eps=eps, motion=motion, rotation_format=rotation_format,
        max_break=max_break, thr_ratio=thr_ratio, loss_eps=loss_eps)
    if interpret:
        in_specs = [pl.BlockSpec()] * (8 + 3 * np_)
        out_specs = [pl.BlockSpec()] * (3 * np_ + 4)
    else:
        in_specs = ([pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)] * 5
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                    * (3 + 3 * np_))
        out_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)]
                     * (3 * np_ + 1)
                     + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3)
    out_shape = (
        [jax.ShapeDtypeStruct(a.shape, jnp.float32)
         for a in params_t * 3]
        + [jax.ShapeDtypeStruct((3, n_pad), jnp.float32),   # warped
           jax.ShapeDtypeStruct((1, 1), jnp.float32),       # loss
           jax.ShapeDtypeStruct((1, 1), jnp.float32),       # counter
           jax.ShapeDtypeStruct((1, 1), jnp.float32)])      # done
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(freq, loss_prev, counter, applied, count, xt_pad, tgt_pad, mask,
      *params_t, *m_t, *v_t)
    n = len(params_t)
    return (list(outs[:n]), list(outs[n:2 * n]), list(outs[2 * n:3 * n]),
            outs[3 * n], outs[3 * n + 1], outs[3 * n + 2], outs[3 * n + 3])


def run_fused_level_ldmk(lvl_params: dict, pts: Array, ldmk_valid: Array,
                         tgt_ldmk: Array, level: Array, pcfg, lcfg,
                         interpret: bool | None = None):
    """Adam-optimize one pyramid level on landmark L2 only (one-kernel
    iteration).

    Drop-in for the unfused ``_solve_level`` body in LNDP landmark mode
    (``w_cd == 0`` so ``pts`` IS the landmark rows): same loss
    (masked mean squared distance), 3-way early stop, pre-step warped
    handoff, optax Adam math. Returns (updated level params dict,
    warped pts [N, 3], stats {iters, loss}).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n = pts.shape[0]
    n_pad = _round_up(max(n, 128), 128)
    xt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
        pts.astype(jnp.float32).T)
    tgt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
        tgt_ldmk.astype(jnp.float32).T)
    mask = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        ldmk_valid.astype(jnp.float32))
    count = jnp.maximum(jnp.sum(mask), 1.0).reshape(1, 1)

    freq = jnp.exp2(jnp.asarray(level, jnp.float32) + 1.0 + pcfg.k0)
    freq = freq.reshape(1, 1)
    p0 = params_to_t(lvl_params)
    zeros = [jnp.zeros_like(a) for a in p0]
    mlp_scale = float(pcfg.mlp_scale)
    call = functools.partial(
        _ldmk_iter_call, mlp_scale=mlp_scale, lr=lcfg.lr, b1=0.9, b2=0.999,
        eps=1e-8, interpret=interpret, motion=pcfg.motion,
        rotation_format=pcfg.rotation_format,
        max_break=lcfg.max_break_count,
        thr_ratio=lcfg.break_threshold_ratio, loss_eps=lcfg.loss_eps)

    def cond(c):
        return (c["it"] < lcfg.iters) & jnp.logical_not(c["done"])

    def body(c):
        newp, newm, newv, warped_t, loss, counter, done_f = call(
            freq, c["loss_prev"].reshape(1, 1),
            c["counter"].astype(jnp.float32).reshape(1, 1),
            c["applied"].astype(jnp.float32).reshape(1, 1), count,
            xt_pad, tgt_pad, mask, c["p"], c["m"], c["v"])
        loss = loss[0, 0]
        done = done_f[0, 0] > 0.5
        return {
            "p": newp, "m": newm, "v": newv,
            "loss_prev": jnp.where(done, c["loss_prev"], loss),
            "counter": counter[0, 0].astype(jnp.int32),
            "done": done,
            "it": c["it"] + 1,
            "applied": c["applied"] + (1 - done.astype(jnp.int32)),
            "aux": warped_t,
            "loss": loss,
        }

    init = {
        "p": p0, "m": zeros, "v": [jnp.zeros_like(a) for a in p0],
        "loss_prev": jnp.float32(1e6),
        "counter": jnp.int32(0),
        "done": jnp.bool_(False),
        "it": jnp.int32(0),
        "applied": jnp.int32(0),
        "aux": xt_pad,
        "loss": jnp.float32(jnp.inf),
    }
    out = jax.lax.while_loop(cond, body, init)
    stats = {"iters": out["it"], "loss": out["loss"]}
    warped = out["aux"].T[:n]
    return t_to_params(out["p"], motion=pcfg.motion), warped, stats


# ---------------------------------------------------------------------------
# Fused NSFP loop (baseline Neural Prior, two-kernel iteration)
# ---------------------------------------------------------------------------

def nsfp_params_to_t(params: list[dict]) -> list[Array]:
    """NSFP layer list [{w [in,out], b [out]}] -> interleaved transposed
    tensors for :func:`_nsfp_forward_t`."""
    t = []
    for p in params:
        t += [p["w"].T, p["b"][:, None]]
    return t


def nsfp_t_to_params(t: list[Array]) -> list[dict]:
    """Inverse of :func:`nsfp_params_to_t` (transposes/reshapes only)."""
    return [{"w": t[2 * i].T, "b": t[2 * i + 1][:, 0]}
            for i in range(len(t) // 2)]


def run_fused_nsfp(params: list[dict], s_sample: Array, s_valid: Array,
                   t_sample: Array, t_valid: Array, lcfg,
                   tm: int = 1024, tn: int = 1024,
                   interpret: bool | None = None):
    """Adam-optimize the NSFP flow field with the two-kernel iteration.

    Drop-in for the unfused ``solve/baselines.optimize_nsfp`` loop body
    (reference ``registration.py:305-330``: plain-chamfer objective,
    trunc=1e9, same 3-way early stop / optax Adam). Returns
    (updated params list, stats {iters, loss}).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n = s_sample.shape[0]
    m = t_sample.shape[0]
    n_pad = _round_up(max(n, 128), 128)
    # NSFP keeps the old 2^21-element working-set budget: its 9-layer
    # MLP carries far more per-grid-step VMEM than the NDP level net and
    # was the path that previously hit the scoped-VMEM ceiling (see
    # _compiler_params); the 2^22 bench A/B covered only NDP + Sim3.
    tm = _tm_cap(tm, n_pad, m, budget=1 << 21)
    m_pad = _round_up(max(m, tm), tm)
    mxu_dist = _SWEEP_MXU_DIST
    packed = _SWEEP_PACKED and n_pad <= 2048 and m_pad <= 2048

    xt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
        s_sample.astype(jnp.float32).T)
    xv = jnp.zeros((n_pad,), bool).at[:n].set(s_valid)
    xbig = jnp.where(xv, 0.0, _BIG)[None, :]
    yc_pad = jnp.zeros((m_pad, 3), jnp.float32).at[:m].set(
        t_sample.astype(jnp.float32))
    yv = jnp.zeros((m_pad,), bool).at[:m].set(t_valid)
    ysqb = jnp.where(yv, jnp.sum(yc_pad * yc_pad, axis=-1), _BIG)[:, None]
    x_len = jnp.maximum(jnp.sum(xv), 1).astype(jnp.float32)
    y_len = jnp.maximum(jnp.sum(yv), 1).astype(jnp.float32)

    freq = jnp.zeros((1, 1), jnp.float32)   # unused by the nsfp forward
    p0 = nsfp_params_to_t(params)
    zeros = [jnp.zeros_like(a) for a in p0]

    def cond(c):
        return (c["it"] < lcfg.iters) & jnp.logical_not(c["done"])

    def body(c):
        warped_t, _, cidx, _, rarg = _fwd_sweep_call(
            freq, xt_pad, xbig, yc_pad, ysqb, c["p"],
            mlp_scale=0.0, tm=tm, interpret=interpret,
            mxu_dist=mxu_dist, packed=packed, model="nsfp")
        loss, g_t = _chamfer_glue(warped_t, cidx, rarg, yc_pad, xv, yv,
                                  x_len, y_len, 1e9)
        small = loss < lcfg.loss_eps
        plateau = jnp.abs(c["loss_prev"] - loss) \
            < c["loss_prev"] * lcfg.break_threshold_ratio
        counter = c["counter"] + plateau.astype(jnp.int32)
        done = small | (counter >= lcfg.max_break_count)
        newp, newm, newv = _bwd_adam_call(
            freq, c["applied"].astype(jnp.float32).reshape(1, 1),
            done.astype(jnp.float32).reshape(1, 1), xt_pad, g_t,
            c["p"], c["m"], c["v"], mlp_scale=0.0, lr=lcfg.lr,
            b1=0.9, b2=0.999, eps=1e-8, tn=tn, interpret=interpret,
            model="nsfp")
        return {
            "p": newp, "m": newm, "v": newv,
            "loss_prev": jnp.where(done, c["loss_prev"], loss),
            "counter": counter,
            "done": done,
            "it": c["it"] + 1,
            "applied": c["applied"] + (1 - done.astype(jnp.int32)),
            "loss": loss,
        }

    init = {
        "p": p0, "m": zeros, "v": [jnp.zeros_like(a) for a in p0],
        "loss_prev": jnp.float32(1e6),
        "counter": jnp.int32(0),
        "done": jnp.bool_(False),
        "it": jnp.int32(0),
        "applied": jnp.int32(0),
        "loss": jnp.float32(jnp.inf),
    }
    out = jax.lax.while_loop(cond, body, init)
    stats = {"iters": out["it"], "loss": out["loss"]}
    return nsfp_t_to_params(out["p"]), stats
