"""Fused NDP level-warp forward/backward Pallas kernels.

The solver's per-iteration critical path is a chain of small ops (posenc ->
3 matmuls -> heads -> Rodrigues; then the transposed chain backward), each
paying an HBM round-trip for its [N, width] activations. These kernels run
the whole chain in VMEM: forward emits only the warped points; backward
RECOMPUTES the forward in VMEM (cheaper than storing activations) and emits
parameter gradients directly, via ``jax.vjp`` traced inside the kernel.

Mosaic-friendly formulation (lane-offset concatenation is not supported on
TPU):
* posenc + input layer: instead of interleaving [sin x, cos x, ...] into a
  [N, 6] tensor, the input weight matrix is split OUTSIDE the kernel into
  its sin rows (0, 2, 4) and cos rows (1, 3, 5) and the kernel computes
  ``sin(fx) @ w_sin + cos(fx) @ w_cos`` — algebraically identical.
* the cross product in the Rodrigues formula uses two constant [3, 3]
  lane-permutation matmuls (roll-by-1 / roll-by-2) instead of slicing.

Covers the benchmark configuration (motion=SE3, axis_angle rotation, no
nonrigidity branch — reference ``config/NDP.yaml``); other configs use the
unfused path (``models/pyramid.level_warp``). Numerics are identical modulo
f32 reassociation; parity is pinned by tests/test_fused_level.py.

Reference semantics: ``NDPLayer.forward`` (``nets.py:111-140``), posenc
without pi (``nets.py:164-177``), mlp_scale=1e-3 (``nets.py:107,117``).
"""
from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails off-TPU builds; fall back to interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

Array = jax.Array

def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _cross(a: Array, b: Array) -> Array:
    """cross(a, b) row-wise via lane-permutation matmuls (Mosaic-safe).

    The [3, 3] roll matrices ((x @ P1)[:, j] = x[:, (j+1) % 3]) are built
    from iota so nothing is closed over as a pallas constant.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)
    p1 = (rows == (cols + 1) % 3).astype(jnp.float32)
    p2 = (rows == (cols + 2) % 3).astype(jnp.float32)
    a1 = jnp.dot(a, p1, preferred_element_type=jnp.float32)
    a2 = jnp.dot(a, p2, preferred_element_type=jnp.float32)
    b1 = jnp.dot(b, p1, preferred_element_type=jnp.float32)
    b2 = jnp.dot(b, p2, preferred_element_type=jnp.float32)
    return a1 * b2 - a2 * b1


def _forward_math(x, freq, w_sin, w_cos, b_in, w_h, b_h, w_rot, b_rot,
                  w_trn, b_trn, mlp_scale: float):
    """The full level warp on VMEM-resident values (pure jnp; backward
    re-traces this under jax.vjp inside the kernel)."""
    s = jnp.sin(x * freq)
    c = jnp.cos(x * freq)
    h = jnp.dot(s, w_sin, preferred_element_type=jnp.float32) \
        + jnp.dot(c, w_cos, preferred_element_type=jnp.float32) + b_in
    h = jnp.maximum(h, 0.0)
    for l in range(w_h.shape[0]):
        h = jnp.maximum(
            jnp.dot(h, w_h[l], preferred_element_type=jnp.float32)
            + b_h[l:l + 1, :], 0.0)
    r = mlp_scale * (jnp.dot(h, w_rot, preferred_element_type=jnp.float32)
                     + b_rot)
    t = mlp_scale * (jnp.dot(h, w_trn, preferred_element_type=jnp.float32)
                     + b_trn)
    # matrix-free Rodrigues (geometry/rotations.rotate_axis_angle); the
    # 1e-12 floor matches geometry.rotations._safe_norm exactly
    theta = jnp.sqrt(jnp.maximum(jnp.sum(r * r, axis=-1, keepdims=True),
                                 1e-12))
    w = r / theta
    st = jnp.sin(theta)
    ct = jnp.cos(theta)
    wxx = _cross(w, x)
    wdx = jnp.sum(w * x, axis=-1, keepdims=True)
    return x + st * wxx + (1.0 - ct) * (w * wdx - x) + t


def _fwd_kernel(freq_ref, x_ref, w_sin_ref, w_cos_ref, b_in_ref, wh_ref,
                bh_ref, w_rot_ref, b_rot_ref, w_trn_ref, b_trn_ref, out_ref,
                *, mlp_scale: float):
    out_ref[:] = _forward_math(
        x_ref[:], freq_ref[0, 0], w_sin_ref[:], w_cos_ref[:], b_in_ref[:],
        wh_ref[:], bh_ref[:], w_rot_ref[:], b_rot_ref[:], w_trn_ref[:],
        b_trn_ref[:], mlp_scale)


def _bwd_kernel(freq_ref, x_ref, w_sin_ref, w_cos_ref, b_in_ref, wh_ref,
                bh_ref, w_rot_ref, b_rot_ref, w_trn_ref, b_trn_ref, g_ref,
                *grad_refs, mlp_scale: float):
    """Tiled over N (VMEM: a [N, 3] temporary pads to 128 lanes, so the
    whole-cloud AD graph overflows the ~16 MB budget — each grid step
    backprops one x-tile and accumulates into the resident output blocks)."""
    i = pl.program_id(0)
    x = x_ref[:]
    freq = freq_ref[0, 0]

    def f(*params):
        return _forward_math(x, freq, *params, mlp_scale)

    _, vjp = jax.vjp(f, w_sin_ref[:], w_cos_ref[:], b_in_ref[:], wh_ref[:],
                     bh_ref[:], w_rot_ref[:], b_rot_ref[:], w_trn_ref[:],
                     b_trn_ref[:])
    grads = vjp(g_ref[:])

    @pl.when(i == 0)
    def _():
        for ref, g in zip(grad_refs, grads):
            ref[:] = g

    @pl.when(i > 0)
    def _():
        for ref, g in zip(grad_refs, grads):
            ref[:] = ref[:] + g


def _param_args(freq, x, w_sin, w_cos, b_in, w_h, b_h, w_rot, b_rot,
                w_trn, b_trn):
    return (freq, x, w_sin, w_cos, b_in, w_h, b_h, w_rot, b_rot, w_trn,
            b_trn)


def _call_fwd(args, mlp_scale: float, interpret: bool):
    kernel = functools.partial(_fwd_kernel, mlp_scale=mlp_scale)
    x = args[1]
    if interpret:
        in_specs = [pl.BlockSpec() for _ in args]
        out_specs = pl.BlockSpec()
    else:
        in_specs = ([pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                    * (len(args) - 1))
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)


def _call_bwd(args, g, mlp_scale: float, interpret: bool, tn: int = 512):
    kernel = functools.partial(_bwd_kernel, mlp_scale=mlp_scale)
    out_shape = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                 for a in args[2:]]
    x = args[1]
    n = x.shape[0]
    tn = min(tn, n)
    n_pad = -(-n // tn) * tn
    if n_pad != n:
        # zero cotangent rows contribute exactly zero gradient (vjp is
        # linear in g), so padding is free of correctness caveats
        x = jnp.zeros((n_pad, 3), x.dtype).at[:n].set(x)
        g = jnp.zeros((n_pad, 3), g.dtype).at[:n].set(g)
        args = args[:1] + (x,) + args[2:]
    inputs = args + (g,)
    grid = (n_pad // tn,)
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    smem = {} if interpret else {"memory_space": pltpu.SMEM}

    def const(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i: (0,) * nd, **mem)

    in_specs = (
        [pl.BlockSpec((1, 1), lambda i: (0, 0), **smem)]
        + [pl.BlockSpec((tn, 3), lambda i: (i, 0), **mem)]        # x
        + [const(a) for a in args[2:]]                             # params
        + [pl.BlockSpec((tn, 3), lambda i: (i, 0), **mem)]        # g
    )
    out_specs = [const(a) for a in args[2:]]
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _fused_level_warp(freq, x, w_sin, w_cos, b_in, w_h, b_h, w_rot, b_rot,
                      w_trn, b_trn, mlp_scale, interpret):
    return _call_fwd(_param_args(freq, x, w_sin, w_cos, b_in, w_h, b_h,
                                 w_rot, b_rot, w_trn, b_trn),
                     mlp_scale, interpret)


def _fused_fwd(freq, x, w_sin, w_cos, b_in, w_h, b_h, w_rot, b_rot,
               w_trn, b_trn, mlp_scale, interpret):
    args = _param_args(freq, x, w_sin, w_cos, b_in, w_h, b_h, w_rot, b_rot,
                       w_trn, b_trn)
    return _call_fwd(args, mlp_scale, interpret), args


def _fused_bwd(mlp_scale, interpret, args, g):
    grads = _call_bwd(args, g, mlp_scale, interpret)
    return (jnp.zeros_like(args[0]), jnp.zeros_like(args[1])) + tuple(grads)


_fused_level_warp.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Transposed [3, N] fused kernels
#
# The untransposed kernels above are measured ~neutral vs XLA: every [N, 3]
# temporary inside the kernel pads 3 -> 128 lanes, so 125/128 of each VPU
# tile idles through the whole posenc/Rodrigues chain (fwd AND the vjp).
# Flipping the layout at the XLA level (models.pyramid.level_warp_t) was
# ALSO neutral — XLA's layout assignment already re-layouts internally. But
# inside Pallas the layout is ours: with N on the 128-lane axis and the 3
# coordinate rows on sublanes, every elementwise op runs at 16x the lane
# utilization ([3, N] = 3/8 sublanes vs [N, 3] = 3/128 lanes) and the
# hidden matmuls become [width, width] @ [width, N] — clean MXU shapes.
# Weights/biases are pre-transposed OUTSIDE the custom_vjp boundary so jax
# chains those (tiny, once-per-iteration) transposes automatically.
# ---------------------------------------------------------------------------


def _rolls() -> tuple[Array, Array]:
    """[3, 3] left-roll permutation matrices: (P1 @ a)[i] = a[(i+1) % 3]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)
    p1 = (cols == (rows + 1) % 3).astype(jnp.float32)
    p2 = (cols == (rows + 2) % 3).astype(jnp.float32)
    return p1, p2


def _cross_t(a: Array, b: Array) -> Array:
    """Row-axis cross product for [3, N] operands via left roll-matmuls."""
    p1, p2 = _rolls()
    a1 = _dot(p1, a)
    a2 = _dot(p2, a)
    b1 = _dot(p1, b)
    b2 = _dot(p2, b)
    return a1 * b2 - a2 * b1


def _dot(a: Array, b: Array) -> Array:
    """In-kernel f32 matmul at Precision.HIGHEST.

    Inside Mosaic, ``jnp.dot``'s DEFAULT precision is a single bf16 MXU
    pass (unlike XLA outside the kernel, where f32 dots are ~f32-accurate).
    That 4e-3 relative rounding, amplified by the rot path's 1e-3-scale
    values and the 1/theta factor in the Rodrigues vjp, produced O(1)
    relative error on the rot-head gradients — measured natively while
    interpret mode was exact. Every in-kernel dot therefore pins HIGHEST;
    the kernel is latency/HBM-bound, not MXU-bound, so the extra passes
    are cheap (see docs/PERFORMANCE.md round-3).
    """
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


_WIDE_MODE = "bf16x3"  # "bf16x3" | "default" | "highest" (A/B knob)


def _dot_wide(a: Array, b: Array) -> Array:
    """In-kernel matmul for the width-sized layers at ~bf16x3 fidelity.

    Mosaic supports only DEFAULT (one bf16 MXU pass, ~4e-3 relative) and
    HIGHEST (six passes) — ``Precision.HIGH`` raises NotImplementedError —
    so the 3-pass scheme is built manually: split each operand into its
    bf16 high part and the f32 remainder and sum three single-pass
    products (the lo*lo term is below f32 epsilon). ~f32 fidelity at half
    HIGHEST's MXU passes. The [3, x] dots stay HIGHEST — their values are
    mlp_scale (1e-3) sized and the Rodrigues vjp multiplies by 1/theta ~
    1e3, so single-pass rounding there blew up to O(1) gradient error
    (see :func:`_dot`).
    """
    if _WIDE_MODE == "highest":
        return _dot(a, b)
    if _WIDE_MODE == "default":
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_lo = b - b_hi

    def d(u, v):
        return jnp.dot(u, v, preferred_element_type=jnp.float32)

    return d(a_hi, b_lo) + d(a_lo, b_hi) + d(a_hi, b_hi)


def _row_basis() -> tuple[Array, Array, Array]:
    """[3, 1] one-hot columns: combine three [1, N] rows into [3, N] by
    broadcast-multiply-add (Mosaic-legal, unlike sublane concatenation)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
    return tuple((rows == i).astype(jnp.float32) for i in range(3))


def _forward_math_t(xt, freq, *p, mlp_scale: float, motion: str = "SE3",
                    rotation_format: str = "axis_angle",
                    nonrigid: bool = False, gate=None):
    """Transposed :func:`_forward_math`: [3, N] points, [out, in] weights,
    [out, 1] biases. Same math/quirks (posenc without pi, mlp_scale,
    1e-12 norm floor, Sim3 ``mlp_scale*s + 1`` — reference
    ``nets.py:111-140``); parity pinned by tests/test_fused_level.py and
    tests/test_fused_iteration.py.

    ``p`` is the 9-tensor SE3 parameter order (w_sin_t, w_cos_t, b_in_t,
    wh_t, bh_t, w_rot_t, b_rot_t, w_trn_t, b_trn_t) plus (w_scl_t,
    b_scl_t) appended for Sim3; "sflow" drops the rot pair (7 tensors).
    All four reference rotation formats are covered: "axis_angle"
    (matrix-free Rodrigues), "euler" (XYZ convention,
    ``rigid_body.py:19-56``: R = Rx @ Ry @ Rz with per-point angles),
    "quaternion" (sign-fixed normalization ``nets.py:154-157`` +
    ``rigid_body.py:62-85``), "6D" (Gram-Schmidt, ``rigid_body.py:5-16``).
    Per-point R @ x rows are assembled via one-hot broadcasts
    (Mosaic-legal, no sublane concatenation).

    ``nonrigid`` appends (w_nr_t, b_nr_t) at the very end and returns
    (warped, nonrigidity) with the reference's level>0 gate applied via
    the traced scalar ``gate`` (``nets.py:131-137``: level 0 never
    gates; its returned nonrigidity is all-ones).
    """
    (w_sin_t, w_cos_t, b_in_t, wh_t, bh_t, *rest) = p
    if nonrigid:
        *rest, w_nr_t, b_nr_t = rest
    if motion == "sflow":
        w_trn_t, b_trn_t = rest
        w_rot_t = b_rot_t = None
        p_scl = []
    else:
        (w_rot_t, b_rot_t, w_trn_t, b_trn_t, *p_scl) = rest
    s = jnp.sin(xt * freq)
    c = jnp.cos(xt * freq)
    h = _dot_wide(w_sin_t, s) + _dot_wide(w_cos_t, c) + b_in_t
    h = jnp.maximum(h, 0.0)
    for l in range(wh_t.shape[0]):
        h = jnp.maximum(_dot_wide(wh_t[l], h) + bh_t[l], 0.0)
    t = mlp_scale * (_dot(w_trn_t, h) + b_trn_t)

    def finish(x_):
        if not nonrigid:
            return x_
        nr = jax.nn.sigmoid(mlp_scale * (_dot(w_nr_t, h) + b_nr_t))
        on = gate > 0.5
        x_out = jnp.where(on, xt + nr * (x_ - xt), x_)
        nr_out = jnp.where(on, nr, jnp.ones_like(nr))
        return x_out, nr_out

    if motion == "sflow":
        return finish(xt + t)
    r = mlp_scale * (_dot(w_rot_t, h) + b_rot_t)
    if rotation_format == "axis_angle":
        theta = jnp.sqrt(jnp.maximum(jnp.sum(r * r, axis=0, keepdims=True),
                                     1e-12))
        w = r / theta
        st = jnp.sin(theta)
        ct = jnp.cos(theta)
        wxx = _cross_t(w, xt)
        wdx = jnp.sum(w * xt, axis=0, keepdims=True)
        rx = xt + st * wxx + (1.0 - ct) * (w * wdx - xt)
    elif rotation_format == "euler":
        # R = Rx(a) @ Ry(b) @ Rz(c) with per-point angle rows; rows of
        # R @ x assembled via one-hot broadcasts (no sublane concat).
        sa, ca = jnp.sin(r[0:1, :]), jnp.cos(r[0:1, :])
        sb, cb = jnp.sin(r[1:2, :]), jnp.cos(r[1:2, :])
        sc, cc = jnp.sin(r[2:3, :]), jnp.cos(r[2:3, :])
        x0, x1, x2 = xt[0:1, :], xt[1:2, :], xt[2:3, :]
        row0 = cb * cc * x0 - cb * sc * x1 + sb * x2
        row1 = ((ca * sc + sa * sb * cc) * x0
                + (ca * cc - sa * sb * sc) * x1 - sa * cb * x2)
        row2 = ((sa * sc - ca * sb * cc) * x0
                + (sa * cc + ca * sb * sc) * x1 + ca * cb * x2)
        e0, e1, e2 = _row_basis()
        rx = e0 * row0 + e1 * row1 + e2 * row2
    elif rotation_format == "quaternion":
        # sign-fixed normalization (nets.py:154-157: divide by
        # copysign(|q|, q_r), non-IEEE — zero q_r keeps +|q|) then the
        # two_s rotation form of rigid_body.py:62-85.
        sq = jnp.sum(r * r, axis=0, keepdims=True)
        root = jnp.sqrt(jnp.maximum(sq, 1e-12))
        denom = jnp.where(r[0:1, :] < 0, -root, root)
        q = r / denom
        two_s = 2.0 / jnp.maximum(jnp.sum(q * q, axis=0, keepdims=True),
                                  1e-12)
        qr, qi = q[0:1, :], q[1:2, :]
        qj, qk = q[2:3, :], q[3:4, :]
        x0, x1, x2 = xt[0:1, :], xt[1:2, :], xt[2:3, :]
        row0 = ((1.0 - two_s * (qj * qj + qk * qk)) * x0
                + two_s * (qi * qj - qk * qr) * x1
                + two_s * (qi * qk + qj * qr) * x2)
        row1 = (two_s * (qi * qj + qk * qr) * x0
                + (1.0 - two_s * (qi * qi + qk * qk)) * x1
                + two_s * (qj * qk - qi * qr) * x2)
        row2 = (two_s * (qi * qk - qj * qr) * x0
                + two_s * (qj * qk + qi * qr) * x1
                + (1.0 - two_s * (qi * qi + qj * qj)) * x2)
        e0, e1, e2 = _row_basis()
        rx = e0 * row0 + e1 * row1 + e2 * row2
    elif rotation_format == "6D":
        # Gram-Schmidt rows (rigid_body.py:5-16): R = [b1; b2; b1 x b2],
        # so each warped row is a b_i . x lane-wise dot.
        a1, a2 = r[0:3, :], r[3:6, :]
        b1 = a1 / jnp.sqrt(jnp.maximum(
            jnp.sum(a1 * a1, axis=0, keepdims=True), 1e-12))
        b2 = a2 - jnp.sum(b1 * a2, axis=0, keepdims=True) * b1
        b2 = b2 / jnp.sqrt(jnp.maximum(
            jnp.sum(b2 * b2, axis=0, keepdims=True), 1e-12))
        b3 = _cross_t(b1, b2)
        e0, e1, e2 = _row_basis()
        rx = (e0 * jnp.sum(b1 * xt, axis=0, keepdims=True)
              + e1 * jnp.sum(b2 * xt, axis=0, keepdims=True)
              + e2 * jnp.sum(b3 * xt, axis=0, keepdims=True))
    else:  # pragma: no cover - guarded by supports_fused_iteration
        raise NotImplementedError(rotation_format)
    if motion == "Sim3":
        w_scl_t, b_scl_t = p_scl
        scl = mlp_scale * (_dot(w_scl_t, h) + b_scl_t) + 1.0
        return finish(scl * rx + t)
    return finish(rx + t)


def _fwd_kernel_t(freq_ref, xt_ref, *param_refs, mlp_scale: float):
    out_ref = param_refs[-1]
    out_ref[:] = _forward_math_t(
        xt_ref[:], freq_ref[0, 0], *[r[:] for r in param_refs[:-1]],
        mlp_scale=mlp_scale)


def _bwd_kernel_t(freq_ref, xt_ref, *refs, mlp_scale: float):
    """Grid over N lane-tiles; recomputes the forward per tile under
    jax.vjp and accumulates parameter gradients into resident outputs."""
    n_params = 9
    param_refs = refs[:n_params]
    g_ref = refs[n_params]
    grad_refs = refs[n_params + 1:]
    i = pl.program_id(0)
    xt = xt_ref[:]
    freq = freq_ref[0, 0]

    def f(*params):
        return _forward_math_t(xt, freq, *params, mlp_scale=mlp_scale)

    _, vjp = jax.vjp(f, *[r[:] for r in param_refs])
    grads = vjp(g_ref[:])

    @pl.when(i == 0)
    def _():
        for ref, g in zip(grad_refs, grads):
            ref[:] = g

    @pl.when(i > 0)
    def _():
        for ref, g in zip(grad_refs, grads):
            ref[:] = ref[:] + g


def _call_fwd_t(args, mlp_scale: float, interpret: bool):
    kernel = functools.partial(_fwd_kernel_t, mlp_scale=mlp_scale)
    xt = args[1]
    if interpret:
        in_specs = [pl.BlockSpec() for _ in args]
        out_specs = pl.BlockSpec()
    else:
        in_specs = ([pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]
                    + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                    * (len(args) - 1))
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.float32),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)


_BWD_TN = 1024  # bwd lane-tile; module knob so A/B scripts can sweep it


def _call_bwd_t(args, g, mlp_scale: float, interpret: bool,
                tn: int | None = None):
    kernel = functools.partial(_bwd_kernel_t, mlp_scale=mlp_scale)
    out_shape = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                 for a in args[2:]]
    xt = args[1]
    n = xt.shape[1]
    tn = min(tn or _BWD_TN, n)
    n_pad = -(-n // tn) * tn
    if n_pad != n:
        # zero cotangent columns contribute exactly zero gradient (the vjp
        # is linear in g), so lane padding is correctness-free
        xt = jnp.zeros((3, n_pad), xt.dtype).at[:, :n].set(xt)
        g = jnp.zeros((3, n_pad), g.dtype).at[:, :n].set(g)
        args = args[:1] + (xt,) + args[2:]
    inputs = args + (g,)
    grid = (n_pad // tn,)
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    smem = {} if interpret else {"memory_space": pltpu.SMEM}

    def const(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i: (0,) * nd, **mem)

    in_specs = (
        [pl.BlockSpec((1, 1), lambda i: (0, 0), **smem)]
        + [pl.BlockSpec((3, tn), lambda i: (0, i), **mem)]        # xt
        + [const(a) for a in args[2:]]                             # params
        + [pl.BlockSpec((3, tn), lambda i: (0, i), **mem)]        # g
    )
    out_specs = [const(a) for a in args[2:]]
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _fused_level_warp_t(freq, xt, w_sin_t, w_cos_t, b_in_t, wh_t, bh_t,
                        w_rot_t, b_rot_t, w_trn_t, b_trn_t, mlp_scale,
                        interpret):
    return _call_fwd_t(
        (freq, xt, w_sin_t, w_cos_t, b_in_t, wh_t, bh_t, w_rot_t, b_rot_t,
         w_trn_t, b_trn_t), mlp_scale, interpret)


def _fused_fwd_t(freq, xt, w_sin_t, w_cos_t, b_in_t, wh_t, bh_t, w_rot_t,
                 b_rot_t, w_trn_t, b_trn_t, mlp_scale, interpret):
    args = (freq, xt, w_sin_t, w_cos_t, b_in_t, wh_t, bh_t, w_rot_t,
            b_rot_t, w_trn_t, b_trn_t)
    return _call_fwd_t(args, mlp_scale, interpret), args


def _fused_bwd_t(mlp_scale, interpret, args, g):
    grads = _call_bwd_t(args, g, mlp_scale, interpret)
    return (jnp.zeros_like(args[0]), jnp.zeros_like(args[1])) + tuple(grads)


_fused_level_warp_t.defvjp(_fused_fwd_t, _fused_bwd_t)


def fused_level_warp_t(p: dict, xt: Array, level: Array, cfg,
                       interpret: bool | None = None) -> Array:
    """Transposed fused level warp: [3, N] points in, [3, N] warped out.

    Drop-in for ``models.pyramid.level_warp_t`` on configs where
    :func:`supports_fused` holds. Differentiable wrt the params (``xt``
    gets zero gradient — the solver optimizes one level on detached
    points). The weight transposes here sit outside the custom_vjp, so
    their adjoints are chained by jax at negligible ([width, width] once
    per iteration) cost.
    """
    if interpret is None:
        interpret = not _on_tpu()
    freq = jnp.exp2(jnp.asarray(level, jnp.float32) + 1.0 + cfg.k0)
    freq = freq.reshape(1, 1)
    w_in = p["input"]["w"].reshape(3, 2, -1)
    return _fused_level_warp_t(
        freq, xt, w_in[:, 0].T, w_in[:, 1].T, p["input"]["b"].reshape(-1, 1),
        jnp.swapaxes(p["hidden"]["w"], -1, -2), p["hidden"]["b"][..., None],
        p["rot"]["w"].T, p["rot"]["b"].reshape(-1, 1),
        p["trn"]["w"].T, p["trn"]["b"].reshape(-1, 1),
        cfg.mlp_scale, interpret)


def supports_fused(cfg) -> bool:
    """Fused path covers the benchmark config (SE3 + axis_angle, no
    nonrigidity gate)."""
    return (cfg.motion == "SE3" and cfg.rotation_format == "axis_angle"
            and not cfg.nonrigidity_est and cfg.depth >= 1)


def fused_level_warp(p: dict, x: Array, level: Array, cfg,
                     interpret: bool | None = None) -> Array:
    """Drop-in fused replacement for ``models.pyramid.level_warp`` (warped
    points only) for configs where :func:`supports_fused` holds.

    ``p`` is one level's param tree ({input,hidden,trn,rot} with w/b
    leaves). Differentiable wrt the params; ``x`` gets zero gradient (the
    solver optimizes one level on detached points).
    """
    if interpret is None:
        interpret = not _on_tpu()
    freq = jnp.exp2(jnp.asarray(level, jnp.float32) + 1.0 + cfg.k0)
    freq = freq.reshape(1, 1)
    # split the interleaved [sx, cx, sy, cy, sz, cz] input rows
    w_in = p["input"]["w"].reshape(3, 2, -1)
    return _fused_level_warp(
        freq, x, w_in[:, 0], w_in[:, 1], p["input"]["b"].reshape(1, -1),
        p["hidden"]["w"], p["hidden"]["b"],
        p["rot"]["w"], p["rot"]["b"].reshape(1, -1),
        p["trn"]["w"], p["trn"]["b"].reshape(1, -1),
        cfg.mlp_scale, interpret)
