"""Fused level-warp Pallas kernels vs the unfused reference path.

Runs in pallas interpret mode on the CPU test backend; the same code path
compiles natively on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.models.pyramid import (
    NDPConfig, init_pyramid_params, level_params, level_warp,
)
from deformationpyramid_tpu.ops.fused_level import (
    fused_level_warp, supports_fused,
)

CFG = NDPConfig(m=4, k0=-4, depth=3, width=64,
                rotation_format="axis_angle", motion="SE3")


def setup(n=256, seed=0):
    params = init_pyramid_params(jax.random.key(seed), CFG)
    lp = level_params(params, 2)
    x = jnp.array(np.random.default_rng(seed).normal(size=(n, 3)) * 0.4,
                  jnp.float32)
    return lp, x


def test_supports_fused_gating():
    assert supports_fused(CFG)
    assert not supports_fused(NDPConfig(motion="Sim3"))
    assert not supports_fused(NDPConfig(rotation_format="quaternion"))
    assert not supports_fused(NDPConfig(nonrigidity_est=True))


def test_fused_forward_matches_unfused():
    lp, x = setup()
    ref, _ = level_warp(lp, x, jnp.int32(2), CFG)
    out = fused_level_warp(lp, x, jnp.int32(2), CFG, interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-6), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_fused_gradients_match_unfused():
    lp, x = setup()
    y = jnp.array(np.random.default_rng(7).normal(size=(256, 3)) * 0.4,
                  jnp.float32)

    def loss_ref(p):
        w, _ = level_warp(p, x, jnp.int32(2), CFG)
        return jnp.sum((w - y) ** 2)

    def loss_fused(p):
        w = fused_level_warp(p, x, jnp.int32(2), CFG, interpret=True)
        return jnp.sum((w - y) ** 2)

    g_ref = jax.grad(loss_ref)(lp)
    g_fused = jax.grad(loss_fused)(lp)
    for path in ("input", "hidden", "trn", "rot"):
        for leaf in ("w", "b"):
            a = np.asarray(g_ref[path][leaf])
            b = np.asarray(g_fused[path][leaf])
            scale = max(np.abs(a).max(), 1e-6)
            assert np.allclose(a, b, atol=3e-5 * scale), (path, leaf,
                np.abs(a - b).max(), scale)


def test_fused_under_vmap_and_jit():
    B = 3
    keys = jax.random.split(jax.random.key(1), B)
    params = jax.vmap(lambda k: init_pyramid_params(k, CFG))(keys)
    lps = jax.vmap(lambda p: level_params(p, 1))(params)
    xs = jnp.array(np.random.default_rng(1).normal(size=(B, 128, 3)) * 0.3,
                   jnp.float32)

    @jax.jit
    def run(lps, xs):
        return jax.vmap(lambda p, x: fused_level_warp(
            p, x, jnp.int32(1), CFG, interpret=True))(lps, xs)

    out = run(lps, xs)
    ref = jax.vmap(lambda p, x: level_warp(p, x, jnp.int32(1), CFG)[0])(lps, xs)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_fused_t_forward_matches_unfused():
    from deformationpyramid_tpu.ops.fused_level import fused_level_warp_t

    lp, x = setup()
    ref, _ = level_warp(lp, x, jnp.int32(2), CFG)
    out = fused_level_warp_t(lp, x.T, jnp.int32(2), CFG, interpret=True).T
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-6), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_fused_t_gradients_match_unfused():
    from deformationpyramid_tpu.ops.fused_level import fused_level_warp_t

    lp, x = setup(n=200)  # non-multiple of the bwd lane tile
    y = jnp.array(np.random.default_rng(7).normal(size=(200, 3)) * 0.4,
                  jnp.float32)

    def loss_ref(p):
        w, _ = level_warp(p, x, jnp.int32(2), CFG)
        return jnp.sum((w - y) ** 2)

    def loss_fused(p):
        w = fused_level_warp_t(p, x.T, jnp.int32(2), CFG, interpret=True)
        return jnp.sum((w - y.T) ** 2)

    g_ref = jax.grad(loss_ref)(lp)
    g_fused = jax.grad(loss_fused)(lp)
    for path in ("input", "hidden", "trn", "rot"):
        for leaf in ("w", "b"):
            a = np.asarray(g_ref[path][leaf])
            b = np.asarray(g_fused[path][leaf])
            scale = max(np.abs(a).max(), 1e-6)
            assert np.allclose(a, b, atol=3e-5 * scale), (path, leaf,
                np.abs(a - b).max(), scale)


def test_fused_t_under_vmap_and_jit():
    from deformationpyramid_tpu.ops.fused_level import fused_level_warp_t

    B = 3
    keys = jax.random.split(jax.random.key(1), B)
    params = jax.vmap(lambda k: init_pyramid_params(k, CFG))(keys)
    lps = jax.vmap(lambda p: level_params(p, 1))(params)
    xs = jnp.array(np.random.default_rng(1).normal(size=(B, 128, 3)) * 0.3,
                   jnp.float32)

    @jax.jit
    def run(lps, xs):
        return jax.vmap(lambda p, x: fused_level_warp_t(
            p, x.T, jnp.int32(1), CFG, interpret=True).T)(lps, xs)

    out = run(lps, xs)
    ref = jax.vmap(lambda p, x: level_warp(p, x, jnp.int32(1), CFG)[0])(lps, xs)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_solver_fused_matches_unfused_end_to_end():
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.solve.registration import (
        SolverConfig, register_pair,
    )

    src, tgt, flow = make_pair(n=300, seed=0, deform=0.08)
    base = dict(pyramid=NDPConfig(m=3, k0=-4, depth=3, width=32),
                iters=40, samples=128, use_pallas=False)
    w_f, _ = jax.jit(lambda k, s, t: register_pair(
        k, s, t, SolverConfig(**base, use_fused=True)))(
        jax.random.key(0), jnp.array(src), jnp.array(tgt))
    w_u, _ = jax.jit(lambda k, s, t: register_pair(
        k, s, t, SolverConfig(**base, use_fused=False)))(
        jax.random.key(0), jnp.array(src), jnp.array(tgt))
    # identical RNG + identical math => trajectories agree to f32 noise
    assert np.allclose(np.asarray(w_f), np.asarray(w_u), atol=1e-3), \
        np.abs(np.asarray(w_f) - np.asarray(w_u)).max()


def test_solver_fused_t_matches_unfused_end_to_end():
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.solve.registration import (
        SolverConfig, register_pair,
    )

    src, tgt, flow = make_pair(n=300, seed=0, deform=0.08)
    base = dict(pyramid=NDPConfig(m=3, k0=-4, depth=3, width=32),
                iters=40, samples=128, use_pallas=False)
    w_f, _ = jax.jit(lambda k, s, t: register_pair(
        k, s, t, SolverConfig(**base, use_fused=True, transposed=True)))(
        jax.random.key(0), jnp.array(src), jnp.array(tgt))
    w_u, _ = jax.jit(lambda k, s, t: register_pair(
        k, s, t, SolverConfig(**base)))(
        jax.random.key(0), jnp.array(src), jnp.array(tgt))
    assert np.allclose(np.asarray(w_f), np.asarray(w_u), atol=1e-3), \
        np.abs(np.asarray(w_f) - np.asarray(w_u)).max()
