"""Per-iteration cost breakdown of the NDP solver hot loop (TPU ablation).

The tunneled profiler hangs, so time components by fori-loop ablation:
each piece runs ITERS times inside one jitted loop with a loop-carried
dependency (defeats CSE/DCE), synced via np.asarray.

Usage: python scripts/ablate_iteration.py [B] [ITERS]
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from deformationpyramid_tpu.data.synthetic import make_batch
from deformationpyramid_tpu.models.pyramid import (
    NDPConfig, init_pyramid_params, level_params, level_warp,
)
from deformationpyramid_tpu.ops.chamfer import truncated_chamfer
from deformationpyramid_tpu.ops.knn import nn_argmin_dual

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 400
N = 2000

CFG = NDPConfig(m=9, k0=-8, depth=3, width=128,
                rotation_format="axis_angle", motion="SE3")


_RTT_MS = 0.0  # set in main(): empty-body harness wall (tunnel round trip)


def timeit(name, fn, *args):
    """Report (wall - harness RTT) / ITERS.

    The raw wall of one synced call includes a ~27 ms tunnel round trip
    (measured: an EMPTY ``c + 1.0`` fori body costs the same 0.067
    ms/iter at ITERS=400 as a 20-op body — the 'floor' is np.asarray's
    fetch latency amortized, not device time). Earlier rounds' absolute
    numbers carried that +0.067 additive constant; ratios survived, the
    component attribution did not (docs/PERFORMANCE.md round-3).
    """
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile + sync
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    raw = (time.perf_counter() - t0) * 1e3
    dt = (raw - _RTT_MS) / ITERS
    print(f"{name:34s} {dt:8.4f} ms/iter   (raw {raw / ITERS:.4f})")
    return dt


def main():
    global _RTT_MS

    # calibrate the harness/tunnel constant with an empty loop body
    @jax.jit
    def empty(c):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: c + 1.0, c)

    z = jnp.zeros((3, 2048), jnp.float32)
    np.asarray(empty(z))
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(empty(z))
        rtts.append((time.perf_counter() - t0) * 1e3)
    _RTT_MS = sorted(rtts)[1]
    print(f"harness RTT baseline: {_RTT_MS:.2f} ms "
          f"({_RTT_MS / ITERS:.4f} ms/iter additive)")

    srcs, tgts, _ = make_batch(B, n=N, seed=0, deform=0.12)
    x = jnp.array(srcs)
    y = jnp.array(tgts)
    keys = jax.random.split(jax.random.key(0), B)
    params_b = jax.vmap(lambda k: init_pyramid_params(k, CFG))(keys)
    lvl = jnp.int32(4)

    lp_b = jax.vmap(lambda p: level_params(p, lvl))(params_b)
    flat0, unravel = jax.flatten_util.ravel_pytree(
        jax.tree.map(lambda a: a[0], lp_b))
    flat_b = jax.vmap(lambda p: jax.flatten_util.ravel_pytree(p)[0])(lp_b)

    # ---- 1. MLP warp forward only
    @jax.jit
    def mlp_fwd(xb):
        def one(x1):
            def body(i, c):
                w, _ = level_warp(unravel(flat0), c, lvl, CFG)
                return c + 1e-9 * w
            return jax.lax.fori_loop(0, ITERS, body, x1)
        return jax.vmap(one)(xb)

    timeit("mlp fwd", mlp_fwd, x)

    # ---- 2. MLP fwd+bwd (loss = sum of warped^2)
    @jax.jit
    def mlp_fwdbwd(fb, xb):
        def one(f, x1):
            def loss(fl):
                w, _ = level_warp(unravel(fl), x1, lvl, CFG)
                return jnp.sum(w * w)
            def body(i, c):
                g = jax.grad(loss)(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, ITERS, body, f)
        return jax.vmap(one)(fb, xb)

    timeit("mlp fwd+bwd", mlp_fwdbwd, flat_b, x)

    # ---- 3. chamfer dual kernel only (argmin sweep)
    @jax.jit
    def cham_kernel(xb, yb):
        def one(x1, y1):
            def body(i, c):
                _, ix, _, iy = nn_argmin_dual(c, y1, use_pallas=True)
                return c + 1e-12 * ix[:, None].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, x1)
        return jax.vmap(one)(xb, yb)

    timeit("chamfer dual kernel", cham_kernel, x, y)

    # ---- 4. chamfer loss fwd+bwd (kernel + gathers + L1 + grads)
    @jax.jit
    def cham_fwdbwd(xb, yb):
        def one(x1, y1):
            def loss(xx):
                return truncated_chamfer(xx, y1, use_pallas=True)
            def body(i, c):
                g = jax.grad(loss)(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, ITERS, body, x1)
        return jax.vmap(one)(xb, yb)

    timeit("chamfer loss fwd+bwd", cham_fwdbwd, x, y)

    # ---- 5. full loss fwd+bwd (warp + chamfer), grads wrt params
    @jax.jit
    def full_fwdbwd(fb, xb, yb):
        def one(f, x1, y1):
            def loss(fl):
                w, _ = level_warp(unravel(fl), x1, lvl, CFG)
                return truncated_chamfer(w, y1, use_pallas=True)
            def body(i, c):
                g = jax.grad(loss)(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, ITERS, body, f)
        return jax.vmap(one)(fb, xb, yb)

    timeit("full loss fwd+bwd", full_fwdbwd, flat_b, x, y)

    # ---- 6. production iteration: loss fwd+bwd + adam + early-stop scalars
    opt = optax.adam(0.01)

    @jax.jit
    def full_iter(fb, xb, yb):
        def one(f, x1, y1):
            def loss(fl):
                w, _ = level_warp(unravel(fl), x1, lvl, CFG)
                return truncated_chamfer(w, y1, use_pallas=True), w
            st0 = opt.init(f)
            def body(i, c):
                f, st, lp, cnt = c
                (l, w), g = jax.value_and_grad(loss, has_aux=True)(f)
                done = (l < 1e-4) | (cnt >= 15)
                upd, st2 = opt.update(g, st, f)
                f2 = optax.apply_updates(f, upd)
                keep = lambda a, b: jnp.where(done, b, a)
                plateau = jnp.abs(lp - l) < lp * 1e-3
                return (jax.tree.map(keep, f2, f), jax.tree.map(keep, st2, st),
                        jnp.where(done, lp, l), cnt + plateau.astype(jnp.int32) * 0)
            out = jax.lax.fori_loop(0, ITERS, body,
                                    (f, st0, jnp.float32(1e6), jnp.int32(0)))
            return out[0]
        return jax.vmap(one)(fb, xb, yb)

    timeit("full iteration (loss+adam+stop)", full_iter, flat_b, x, y)

    # ---- 7. [3, N] transposed variants (round-3 layout lever)
    from deformationpyramid_tpu.models.pyramid import level_warp_t

    @jax.jit
    def mlp_fwd_t(xb):
        def one(x1):
            xt = x1.T
            def body(i, c):
                w = level_warp_t(unravel(flat0), c, lvl, CFG)
                return c + 1e-9 * w
            return jax.lax.fori_loop(0, ITERS, body, xt)
        return jax.vmap(one)(xb)

    timeit("mlp fwd [3,N]", mlp_fwd_t, x)

    @jax.jit
    def full_fwdbwd_t(fb, xb, yb):
        def one(f, x1, y1):
            xt = x1.T
            def loss(fl):
                w = level_warp_t(unravel(fl), xt, lvl, CFG).T
                return truncated_chamfer(w, y1, use_pallas=True)
            def body(i, c):
                g = jax.grad(loss)(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, ITERS, body, f)
        return jax.vmap(one)(fb, xb, yb)

    timeit("full loss fwd+bwd [3,N]", full_fwdbwd_t, flat_b, x, y)

    # ---- 8. fused level-warp Pallas kernel variants (ops/fused_level)
    from deformationpyramid_tpu.ops.fused_level import fused_level_warp

    @jax.jit
    def fused_fwd(xb):
        def one(x1):
            def body(i, c):
                w = fused_level_warp(unravel(flat0), c, lvl, CFG)
                return c + 1e-9 * w
            return jax.lax.fori_loop(0, ITERS, body, x1)
        return jax.vmap(one)(xb)

    timeit("fused warp fwd", fused_fwd, x)

    @jax.jit
    def fused_fwdbwd(fb, xb):
        def one(f, x1):
            def loss(fl):
                w = fused_level_warp(unravel(fl), x1, lvl, CFG)
                return jnp.sum(w * w)
            def body(i, c):
                g = jax.grad(loss)(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, ITERS, body, f)
        return jax.vmap(one)(fb, xb)

    timeit("fused warp fwd+bwd", fused_fwdbwd, flat_b, x)

    @jax.jit
    def full_fwdbwd_fused(fb, xb, yb):
        def one(f, x1, y1):
            def loss(fl):
                w = fused_level_warp(unravel(fl), x1, lvl, CFG)
                return truncated_chamfer(w, y1, use_pallas=True)
            def body(i, c):
                g = jax.grad(loss)(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, ITERS, body, f)
        return jax.vmap(one)(fb, xb, yb)

    timeit("full loss fwd+bwd (fused warp)", full_fwdbwd_fused, flat_b, x, y)

    # ---- 8b. transposed [3, N]-internal fused kernel variants
    from deformationpyramid_tpu.ops.fused_level import fused_level_warp_t

    @jax.jit
    def fused_t_fwd(xb):
        def one(x1):
            xt = x1.T
            def body(i, c):
                w = fused_level_warp_t(unravel(flat0), c, lvl, CFG)
                return c + 1e-9 * w
            return jax.lax.fori_loop(0, ITERS, body, xt)
        return jax.vmap(one)(xb)

    timeit("fused_t warp fwd", fused_t_fwd, x)

    @jax.jit
    def fused_t_fwdbwd(fb, xb):
        def one(f, x1):
            xt = x1.T
            def loss(fl):
                w = fused_level_warp_t(unravel(fl), xt, lvl, CFG)
                return jnp.sum(w * w)
            def body(i, c):
                g = jax.grad(loss)(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, ITERS, body, f)
        return jax.vmap(one)(fb, xb)

    timeit("fused_t warp fwd+bwd", fused_t_fwdbwd, flat_b, x)

    @jax.jit
    def full_fwdbwd_fused_t(fb, xb, yb):
        def one(f, x1, y1):
            xt = x1.T
            def loss(fl):
                w = fused_level_warp_t(unravel(fl), xt, lvl, CFG).T
                return truncated_chamfer(w, y1, use_pallas=True)
            def body(i, c):
                g = jax.grad(loss)(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, ITERS, body, f)
        return jax.vmap(one)(fb, xb, yb)

    timeit("full loss fwd+bwd (fused_t)", full_fwdbwd_fused_t, flat_b, x, y)

    # ---- 9. adam + early-stop scalars only (fixed dummy grad)
    @jax.jit
    def adam_only(fb):
        def one(f):
            st0 = opt.init(f)
            g = f * 1e-6

            def body(i, c):
                f, st, lp, cnt = c
                l = jnp.sum(f * f) * 1e-9
                done = (l < 1e-4) | (cnt >= 15)
                upd, st2 = opt.update(g, st, f)
                f2 = optax.apply_updates(f, upd)
                keep = lambda a, b: jnp.where(done, b, a)
                plateau = jnp.abs(lp - l) < lp * 1e-3
                return (jax.tree.map(keep, f2, f),
                        jax.tree.map(keep, st2, st),
                        jnp.where(done, lp, l),
                        cnt + plateau.astype(jnp.int32) * 0)

            out = jax.lax.fori_loop(0, ITERS, body,
                                    (f, st0, jnp.float32(1e6), jnp.int32(0)))
            return out[0]
        return jax.vmap(one)(fb)

    timeit("adam+stop only", adam_only, flat_b)

    # ---- 10. chamfer glue only: gathers + L1 sums + grad wrt x at FIXED idx
    @jax.jit
    def glue_only(xb, yb):
        def one(x1, y1):
            _, ix, _, iy = nn_argmin_dual(x1, y1, use_pallas=True)

            def loss(xx):
                nn_x = y1[ix]
                sq_x = jnp.sum((xx - nn_x) ** 2, axis=-1)
                nn_y = xx[iy]
                sq_y = jnp.sum((y1 - nn_y) ** 2, axis=-1)
                n = xx.shape[0]
                sx = jnp.sum(jnp.sqrt(jnp.maximum(sq_x, 1e-16)))
                sy = jnp.sum(jnp.sqrt(jnp.maximum(sq_y, 1e-16)))
                return sx / n + sy / y1.shape[0]

            def body(i, c):
                g = jax.grad(loss)(c)
                return c + 1e-9 * g
            return jax.lax.fori_loop(0, ITERS, body, x1)
        return jax.vmap(one)(xb, yb)

    timeit("chamfer glue only (fixed idx)", glue_only, x, y)

    # ---- 11. sweep kernel alone at both tile sizes
    from deformationpyramid_tpu.ops.knn import nn_argmin_dual_pallas

    def make_cham_tn(tn):
        @jax.jit
        def cham_kernel_tn(xb, yb):
            def one(x1, y1):
                def body(i, c):
                    _, ix, _, iy = nn_argmin_dual_pallas(c, y1, tn=tn)
                    return c + 1e-12 * ix[:, None].astype(jnp.float32)
                return jax.lax.fori_loop(0, ITERS, body, x1)
            return jax.vmap(one)(xb, yb)
        return cham_kernel_tn

    for tn in (512, 1024):
        timeit(f"chamfer dual kernel tn={tn}", make_cham_tn(tn), x, y)

    @jax.jit
    def full_iter_t(fb, xb, yb):
        def one(f, x1, y1):
            xt = x1.T
            def loss(fl):
                w = level_warp_t(unravel(fl), xt, lvl, CFG).T
                return truncated_chamfer(w, y1, use_pallas=True), w
            st0 = opt.init(f)
            def body(i, c):
                f, st, lp, cnt = c
                (l, w), g = jax.value_and_grad(loss, has_aux=True)(f)
                done = (l < 1e-4) | (cnt >= 15)
                upd, st2 = opt.update(g, st, f)
                f2 = optax.apply_updates(f, upd)
                keep = lambda a, b: jnp.where(done, b, a)
                plateau = jnp.abs(lp - l) < lp * 1e-3
                return (jax.tree.map(keep, f2, f), jax.tree.map(keep, st2, st),
                        jnp.where(done, lp, l), cnt + plateau.astype(jnp.int32) * 0)
            out = jax.lax.fori_loop(0, ITERS, body,
                                    (f, st0, jnp.float32(1e6), jnp.int32(0)))
            return out[0]
        return jax.vmap(one)(fb, xb, yb)

    timeit("full iteration [3,N]", full_iter_t, flat_b, x, y)

    # ---- 12. fused-iteration launch split (ops/fused_iteration; the
    # production B=1 path — measured on the first pair, un-vmapped).
    # Decides whether merging kernel 2 into the next iteration's kernel 1
    # (halving launches) is worth building.
    from deformationpyramid_tpu.ops import fused_iteration as fi

    x1, y1 = x[0], y[0]
    n_pad = fi._round_up(N, 128)
    tm = min(min(512, max(8, ((1 << 20) // n_pad) // 8 * 8)),
             fi._round_up(N, 8))
    m_pad = fi._round_up(max(N, tm), tm)
    xt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :N].set(x1.T)
    xv = jnp.zeros((n_pad,), bool).at[:N].set(True)
    xbig = jnp.where(xv, 0.0, fi._BIG)[None, :]
    yc = jnp.zeros((m_pad, 3), jnp.float32).at[:N].set(y1)
    yv = jnp.zeros((m_pad,), bool).at[:N].set(True)
    ysqb = jnp.where(yv, jnp.sum(yc * yc, axis=-1), fi._BIG)[:, None]
    xl = jnp.float32(N)
    freq = jnp.exp2(jnp.float32(4) + 1.0 + CFG.k0).reshape(1, 1)
    p_t = fi.params_to_t(unravel(flat0))
    m_t = [jnp.zeros_like(a) for a in p_t]
    v_t = [jnp.zeros_like(a) for a in p_t]
    scal0 = jnp.zeros((1, 1), jnp.float32)

    @jax.jit
    def fused_k1(xt):
        def body(i, c):
            warped, _, _, _, _ = fi._fwd_sweep_call(
                freq, c, xbig, yc, ysqb, p_t, mlp_scale=CFG.mlp_scale,
                tm=tm, interpret=False)
            return c + 1e-9 * warped
        return jax.lax.fori_loop(0, ITERS, body, xt)

    timeit("fused k1 (warp+sweep)", fused_k1, xt_pad)

    @jax.jit
    def fused_k1_glue(xt):
        def body(i, c):
            warped, _, cidx, _, rarg = fi._fwd_sweep_call(
                freq, c, xbig, yc, ysqb, p_t, mlp_scale=CFG.mlp_scale,
                tm=tm, interpret=False)
            loss, g_t = fi._chamfer_glue(warped, cidx, rarg, yc, xv, yv,
                                         xl, xl, 1e9)
            return c + 1e-9 * g_t + 1e-12 * loss
        return jax.lax.fori_loop(0, ITERS, body, xt)

    timeit("fused k1 + glue", fused_k1_glue, xt_pad)

    @jax.jit
    def fused_k2(p0):
        g_pad = xt_pad * 1e-3

        def body(i, c):
            p, m, v = c
            newp, newm, newv = fi._bwd_adam_call(
                freq, scal0, scal0, xt_pad, g_pad, p, m, v,
                mlp_scale=CFG.mlp_scale, lr=0.01, b1=0.9, b2=0.999,
                eps=1e-8, tn=1024, interpret=False)
            return (newp, newm, newv)

        return jax.lax.fori_loop(0, ITERS, body, (p0, m_t, v_t))

    timeit("fused k2 (vjp+adam)", fused_k2, p_t)

    from deformationpyramid_tpu.solve.loop import LoopConfig

    lcfg_fixed = LoopConfig(iters=ITERS, lr=0.01, max_break_count=10**9,
                            break_threshold_ratio=0.0, loss_eps=0.0)

    @jax.jit
    def fused_full(x1_):
        return fi.run_fused_level(unravel(flat0), x1_,
                                  jnp.ones((N,), bool), y1,
                                  jnp.ones((N,), bool), jnp.int32(4),
                                  CFG, lcfg_fixed)[2]["loss"]

    timeit("fused full iteration (k1+glue+k2)", fused_full, x1)


if __name__ == "__main__":
    main()
