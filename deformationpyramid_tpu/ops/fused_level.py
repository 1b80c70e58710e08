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
