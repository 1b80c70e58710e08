"""Parity tests for the two-kernel fused solver iteration
(``ops/fused_iteration.py``), interpret-mode on CPU.

Strategy mirrors tests/test_fused_level.py: every stage is pinned against
the unfused reference path (``models.pyramid.level_warp`` +
``ops.chamfer.truncated_chamfer`` + ``solve.loop.run_adam_loop``), then a
full level and a full registration are compared end-to-end.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deformationpyramid_tpu.ops import fused_level as _fl


@pytest.fixture(autouse=True)
def _exact_wide_dots():
    """Pin the in-kernel wide matmuls to HIGHEST and the sweep to the
    exact (unpacked, VPU-distance) selection for parity tests: the
    default bf16x3 mode drops the lo*lo term (~2^-16 relative — see
    ops/fused_level._dot_wide) and the packed selection truncates 11
    mantissa bits, either of which would make trajectory-equality
    assertions flaky. The production knobs are covered at near-tie
    tolerance by test_fwd_sweep_kernel_mxu_packed_variants and
    test_run_fused_level_default_knobs."""
    from deformationpyramid_tpu.ops import fused_iteration as _fi

    prev = (_fl._WIDE_MODE, _fi._SWEEP_MXU_DIST, _fi._SWEEP_PACKED)
    _fl._WIDE_MODE = "highest"
    _fi._SWEEP_MXU_DIST = False
    _fi._SWEEP_PACKED = False
    try:
        yield
    finally:
        _fl._WIDE_MODE, _fi._SWEEP_MXU_DIST, _fi._SWEEP_PACKED = prev

from deformationpyramid_tpu.models.pyramid import (
    NDPConfig, init_pyramid_params, level_params, level_warp,
)
from deformationpyramid_tpu.ops.chamfer import truncated_chamfer
from deformationpyramid_tpu.ops.fused_iteration import (
    _bwd_adam_call, _chamfer_glue, _fwd_sweep_call, params_to_t,
    run_fused_level, supports_fused_iteration, t_to_params,
)
from deformationpyramid_tpu.solve.loop import LoopConfig, run_adam_loop

CFG = NDPConfig(m=4, k0=-6, depth=3, width=64, rotation_format="axis_angle",
                motion="SE3")


def _setup(n=200, m=260, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((n, 3)) * 0.4, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((m, 3)) * 0.4, jnp.float32)
    params = init_pyramid_params(jax.random.key(seed), CFG)
    lvl_p = level_params(params, 1)
    return pts, tgt, lvl_p


def _pad_inputs(pts, tgt, lvl=1):
    """Replicates run_fused_level's padding prologue for kernel-level tests."""
    from deformationpyramid_tpu.ops.fused_iteration import _BIG, _round_up

    n, m = pts.shape[0], tgt.shape[0]
    n_pad = _round_up(max(n, 128), 128)
    tm = min(512, _round_up(max(m, 8), 8))
    m_pad = _round_up(max(m, tm), tm)
    xt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(pts.T)
    xv = jnp.zeros((n_pad,), bool).at[:n].set(True)
    xbig = jnp.where(xv, 0.0, _BIG)[None, :]
    yc = jnp.zeros((m_pad, 3), jnp.float32).at[:m].set(tgt)
    yv = jnp.zeros((m_pad,), bool).at[:m].set(True)
    ysqb = jnp.where(yv, jnp.sum(yc * yc, axis=-1), _BIG)[:, None]
    freq = jnp.exp2(jnp.float32(lvl) + 1.0 + CFG.k0).reshape(1, 1)
    return xt_pad, xbig, yc, ysqb, xv, yv, freq, tm, n_pad, m_pad


def test_tm_cap_sublane_alignment():
    """Every tile height _tm_cap emits is a multiple of 8 (Mosaic sublane)
    and never pads m more than the un-stepped tile would; the halving
    step-down for non-pow2 m must re-round (816 -> 408 -> 204 was the
    bug: 204 % 8 != 0)."""
    from deformationpyramid_tpu.ops.fused_iteration import _round_up, _tm_cap

    for budget in (1 << 21, 1 << 22):
        for n_pad in (128, 256, 2048, 2560, 4096):
            for m in (7, 100, 200, 2048, 2049, 2500, 3000, 5000):
                tm = _tm_cap(2048, n_pad, m, budget=budget)
                assert tm % 8 == 0, (budget, n_pad, m, tm)
                assert tm >= 8
                base = min(2048, max(8, (budget // n_pad) // 8 * 8))
                base = min(base, _round_up(max(m, 8), 8))
                assert _round_up(max(m, 8), tm) <= _round_up(max(m, 8), base)


def test_param_roundtrip():
    _, _, lvl_p = _setup()
    back = t_to_params(params_to_t(lvl_p))
    for k in lvl_p:
        for kk in lvl_p[k]:
            assert np.array_equal(np.asarray(lvl_p[k][kk]),
                                  np.asarray(back[k][kk])), (k, kk)


def test_supports_gate():
    assert supports_fused_iteration(CFG, 0.0, 0)
    assert not supports_fused_iteration(CFG, 0.5, 0)
    assert not supports_fused_iteration(CFG, 0.0, 5)
    assert supports_fused_iteration(
        NDPConfig(motion="Sim3", rotation_format="axis_angle"), 0.0, 0)
    assert supports_fused_iteration(
        NDPConfig(motion="Sim3", rotation_format="euler"), 0.0, 0)
    assert supports_fused_iteration(
        NDPConfig(motion="sflow", rotation_format="axis_angle"), 0.0, 0)
    assert supports_fused_iteration(
        NDPConfig(rotation_format="quaternion"), 0.0, 0)
    assert supports_fused_iteration(
        NDPConfig(rotation_format="6D"), 0.0, 0)
    # nonrigidity branch: supported when the nr head exists; a w_reg>0
    # objective without the head falls back (inconsistent config)
    assert supports_fused_iteration(
        NDPConfig(nonrigidity_est=True), 0.5, 0)
    assert not supports_fused_iteration(NDPConfig(), 0.5, 0)
    assert not supports_fused_iteration(
        NDPConfig(depth=1, rotation_format="axis_angle"), 0.0, 0)


def test_fwd_sweep_kernel_matches_reference():
    """Kernel 1: warped points == level_warp; indices == XLA argmin."""
    pts, tgt, lvl_p = _setup()
    xt_pad, xbig, yc, ysqb, xv, yv, freq, tm, n_pad, m_pad = _pad_inputs(
        pts, tgt)
    warped_t, cmin, cidx, rmin, rarg = _fwd_sweep_call(
        freq, xt_pad, xbig, yc, ysqb, params_to_t(lvl_p),
        mlp_scale=CFG.mlp_scale, tm=tm, interpret=True)

    ref_warped, _ = level_warp(lvl_p, pts, 1, CFG)
    got = np.asarray(warped_t).T[:pts.shape[0]]
    assert np.abs(got - np.asarray(ref_warped)).max() < 1e-5

    d = ((got[:, None] - np.asarray(tgt)[None]) ** 2).sum(-1)
    n, m = pts.shape[0], tgt.shape[0]
    assert (np.asarray(cidx)[0, :n] == d.argmin(1)).all()
    assert (np.asarray(rarg)[:m, 0] == d.argmin(0)).all()
    assert np.allclose(np.asarray(cmin)[0, :n], d.min(1), atol=1e-5)
    assert np.allclose(np.asarray(rmin)[:m, 0], d.min(0), atol=1e-5)


def test_fwd_sweep_kernel_mxu_packed_variants():
    """The MXU-distance and packed-selection knobs keep exact warped
    points; indices may deviate from the exact argmin only on near-ties
    (the packed form's ~1.2e-4-relative mantissa truncation; _dot_wide
    is exact under the HIGHEST pin of this suite)."""
    pts, tgt, lvl_p = _setup(n=210, m=330, seed=7)
    xt_pad, xbig, yc, ysqb, xv, yv, freq, tm, n_pad, m_pad = _pad_inputs(
        pts, tgt)
    ref_warped, _ = level_warp(lvl_p, pts, 1, CFG)
    n, m = pts.shape[0], tgt.shape[0]
    d = ((np.asarray(ref_warped)[:, None] - np.asarray(tgt)[None]) ** 2
         ).sum(-1)

    def near_tie_ok(idx, ref_idx, dmat, axis_min, tag):
        flips = idx != ref_idx
        if not flips.any():
            return
        chosen = np.take_along_axis(
            dmat, idx[:, None], 1)[:, 0] if dmat.ndim == 2 else dmat[idx]
        rel = (chosen[flips] - axis_min[flips]) / np.maximum(
            axis_min[flips], 1e-30)
        assert rel.max() < 3e-4, (tag, rel.max())

    for mxu in (False, True):
        for packed in (False, True):
            warped_t, cmin, cidx, rmin, rarg = _fwd_sweep_call(
                freq, xt_pad, xbig, yc, ysqb, params_to_t(lvl_p),
                mlp_scale=CFG.mlp_scale, tm=tm, interpret=True,
                mxu_dist=mxu, packed=packed)
            got = np.asarray(warped_t).T[:n]
            assert np.abs(got - np.asarray(ref_warped)).max() < 1e-5
            near_tie_ok(np.asarray(cidx)[0, :n], d.argmin(1), d,
                        d.min(1), ("x2y", mxu, packed))
            near_tie_ok(np.asarray(rarg)[:m, 0], d.argmin(0), d.T,
                        d.min(0), ("y2x", mxu, packed))


def test_glue_matches_truncated_chamfer():
    """Glue loss == truncated_chamfer value; grad == autodiff grad."""
    pts, tgt, lvl_p = _setup()
    xt_pad, xbig, yc, ysqb, xv, yv, freq, tm, n_pad, m_pad = _pad_inputs(
        pts, tgt)
    for trunc in (1e9, 0.25):
        warped_t, _, cidx, _, rarg = _fwd_sweep_call(
            freq, xt_pad, xbig, yc, ysqb, params_to_t(lvl_p),
            mlp_scale=CFG.mlp_scale, tm=tm, interpret=True)
        x_len = jnp.float32(pts.shape[0])
        y_len = jnp.float32(tgt.shape[0])
        loss, g_t = _chamfer_glue(warped_t, cidx, rarg, yc, xv, yv,
                                  x_len, y_len, trunc)

        w = jnp.asarray(np.asarray(warped_t).T[:pts.shape[0]])
        ref = truncated_chamfer(w, tgt, trunc=trunc, use_pallas=False)
        assert abs(float(loss) - float(ref)) < 1e-6, trunc

        gref = jax.grad(lambda q: truncated_chamfer(
            q, tgt, trunc=trunc, use_pallas=False))(w)
        got = np.asarray(g_t).T[:pts.shape[0]]
        assert np.abs(got - np.asarray(gref)).max() < 1e-5, trunc


def test_bwd_adam_matches_optax_step():
    """Kernel 2: param grads == jax.grad through level_warp; the update ==
    one optax.adam step; done=1 holds everything."""
    pts, tgt, lvl_p = _setup()
    xt_pad, xbig, yc, ysqb, xv, yv, freq, tm, n_pad, m_pad = _pad_inputs(
        pts, tgt)
    p_t = params_to_t(lvl_p)
    m_t = [jnp.zeros_like(a) for a in p_t]
    v_t = [jnp.zeros_like(a) for a in p_t]
    rng = np.random.default_rng(3)
    g_full = jnp.asarray(rng.standard_normal((pts.shape[0], 3)) * 0.1,
                         jnp.float32)
    g_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :pts.shape[0]].set(
        g_full.T)

    step = jnp.zeros((1, 1), jnp.float32)
    live = jnp.zeros((1, 1), jnp.float32)
    newp, newm, newv = _bwd_adam_call(
        freq, step, live, xt_pad, g_pad, p_t, m_t, v_t,
        mlp_scale=CFG.mlp_scale, lr=0.01, b1=0.9, b2=0.999, eps=1e-8,
        tn=128, interpret=True)

    def loss_fn(p):
        warped, _ = level_warp(p, pts, 1, CFG)
        return jnp.sum(warped * g_full)

    gref = jax.grad(loss_fn)(lvl_p)
    opt = optax.adam(0.01)
    st = opt.init(lvl_p)
    upd, _ = opt.update(gref, st, lvl_p)
    ref_p = optax.apply_updates(lvl_p, upd)
    got_p = t_to_params(list(newp))
    for k in ref_p:
        for kk in ref_p[k]:
            a, b = np.asarray(ref_p[k][kk]), np.asarray(got_p[k][kk])
            assert np.abs(a - b).max() < 1e-5, (k, kk, np.abs(a - b).max())

    held, heldm, heldv = _bwd_adam_call(
        freq, step, jnp.ones((1, 1), jnp.float32), xt_pad, g_pad,
        p_t, m_t, v_t, mlp_scale=CFG.mlp_scale, lr=0.01, b1=0.9, b2=0.999,
        eps=1e-8, tn=128, interpret=True)
    for a, b in zip(held, p_t):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a in heldm:
        assert not np.asarray(a).any()


def test_run_fused_level_matches_run_adam_loop():
    """Full level: identical early-stop iteration counts and matching
    loss/params/warped within f32 drift vs the unfused loop."""
    pts, tgt, lvl_p = _setup(n=180, m=200, seed=5)
    lcfg = LoopConfig(iters=25, lr=0.01, max_break_count=15,
                      break_threshold_ratio=0.001)
    pts_valid = jnp.ones((pts.shape[0],), bool)
    t_valid = jnp.ones((tgt.shape[0],), bool)

    new_p, warped, stats = run_fused_level(
        lvl_p, pts, pts_valid, tgt, t_valid, jnp.int32(1), CFG, lcfg,
        interpret=True)

    def loss_fn(p, it, key):
        w, _ = level_warp(p, pts, 1, CFG)
        return truncated_chamfer(w, tgt, use_pallas=False), w

    ref_p, ref_warped, ref_stats = run_adam_loop(loss_fn, lvl_p, lcfg,
                                                 aux_init=pts)

    assert int(stats["iters"]) == int(ref_stats["iters"])
    assert abs(float(stats["loss"]) - float(ref_stats["loss"])) < 1e-4
    assert np.abs(np.asarray(warped) - np.asarray(ref_warped)).max() < 1e-3
    for k in ref_p:
        for kk in ref_p[k]:
            a, b = np.asarray(ref_p[k][kk]), np.asarray(new_p[k][kk])
            assert np.abs(a - b).max() < 1e-3, (k, kk)


@pytest.mark.parametrize("motion,rot,iters,tol", [
    # quaternion/6D renormalize a ~mlp_scale-sized head output, so the
    # backward is 1/|r| ~ 1e3-conditioned: per-step grads match to ~1e-6
    # relative (test_forward_math_t_grad_parity) but f32 trajectories
    # decorrelate chaotically past ~5 steps — pin a short horizon there.
    ("SE3", "euler", 25, 1e-3), ("Sim3", "axis_angle", 25, 1e-3),
    ("Sim3", "euler", 25, 1e-3), ("sflow", "axis_angle", 25, 1e-3),
    ("SE3", "quaternion", 5, 1e-2), ("SE3", "6D", 5, 1e-2),
    ("Sim3", "quaternion", 5, 1e-2)])
def test_run_fused_level_motion_rotation_variants(motion, rot, iters, tol):
    """Full motion x rotation-format coverage (Sim3 shape-transfer demo,
    quaternion/6D/sflow config options): kernel warp == level_warp, and
    the full fused level matches the unfused Adam loop — same early-stop
    count, loss/params/warped within f32 drift."""
    cfg = NDPConfig(m=4, k0=-6, depth=3, width=64,
                    rotation_format=rot, motion=motion)
    pts, tgt, _ = _setup(n=180, m=200, seed=8)
    params = init_pyramid_params(jax.random.key(8), cfg)
    lvl_p = level_params(params, 1)

    # kernel-level warp parity
    xt_pad, xbig, yc, ysqb, xv, yv, freq, tm, n_pad, m_pad = _pad_inputs(
        pts, tgt)
    warped_t, _, _, _, _ = _fwd_sweep_call(
        freq, xt_pad, xbig, yc, ysqb, params_to_t(lvl_p),
        mlp_scale=cfg.mlp_scale, tm=tm, interpret=True,
        motion=motion, rotation_format=rot)
    ref_warped, _ = level_warp(lvl_p, pts, 1, cfg)
    got = np.asarray(warped_t).T[:pts.shape[0]]
    assert np.abs(got - np.asarray(ref_warped)).max() < 1e-5

    # full-level equivalence vs the unfused loop
    lcfg = LoopConfig(iters=iters, lr=0.01, max_break_count=15,
                      break_threshold_ratio=0.001)
    pts_valid = jnp.ones((pts.shape[0],), bool)
    t_valid = jnp.ones((tgt.shape[0],), bool)
    new_p, warped, stats = run_fused_level(
        lvl_p, pts, pts_valid, tgt, t_valid, jnp.int32(1), cfg, lcfg,
        interpret=True)

    def loss_fn(p, it, key):
        w, _ = level_warp(p, pts, 1, cfg)
        return truncated_chamfer(w, tgt, use_pallas=False), w

    ref_p, ref_warped, ref_stats = run_adam_loop(loss_fn, lvl_p, lcfg,
                                                 aux_init=pts)
    assert int(stats["iters"]) == int(ref_stats["iters"])
    assert abs(float(stats["loss"]) - float(ref_stats["loss"])) < tol
    assert np.abs(np.asarray(warped) - np.asarray(ref_warped)).max() < tol
    for k in ref_p:
        for kk in ref_p[k]:
            a, b = np.asarray(ref_p[k][kk]), np.asarray(new_p[k][kk])
            assert np.abs(a - b).max() < tol, (k, kk)


@pytest.mark.parametrize("motion,rot", [
    ("SE3", "axis_angle"), ("SE3", "euler"), ("SE3", "quaternion"),
    ("SE3", "6D"), ("Sim3", "quaternion"), ("sflow", "axis_angle")])
def test_forward_math_t_grad_parity(motion, rot):
    """Parameter gradients through the transposed fused warp chain match
    jax.grad through level_warp to ~1e-6 RELATIVE for every motion x
    rotation format (the per-step guarantee behind the trajectory tests;
    quaternion/6D are 1/|r|-conditioned so absolute drift compounds)."""
    cfg = NDPConfig(m=4, k0=-6, depth=3, width=64,
                    rotation_format=rot, motion=motion)
    rng = np.random.default_rng(8)
    pts = jnp.asarray(rng.standard_normal((180, 3)) * 0.4, jnp.float32)
    g = jnp.asarray(rng.standard_normal((180, 3)) * 0.1, jnp.float32)
    params = init_pyramid_params(jax.random.key(8), cfg)
    lvl_p = level_params(params, 1)
    freq = jnp.exp2(jnp.float32(1) + 1.0 + cfg.k0)

    gref = jax.grad(lambda p: jnp.sum(level_warp(p, pts, 1, cfg)[0] * g))(
        lvl_p)

    def loss_t(pt):
        w = _fl._forward_math_t(pts.T, freq, *pt, mlp_scale=cfg.mlp_scale,
                                motion=motion, rotation_format=rot)
        return jnp.sum(w * g.T)

    gt = t_to_params(list(jax.grad(loss_t)(params_to_t(lvl_p))))
    for k in gref:
        for kk in gref[k]:
            a, b = np.asarray(gref[k][kk]), np.asarray(gt[k][kk])
            rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
            assert rel < 1e-5, (k, kk, rel)


def test_run_fused_level_default_knobs():
    """The production sweep knobs (MXU distances + packed selection)
    converge equivalently to the exact-selection path: same order of
    iterations, loss within the near-tie band, warped cloud within f32
    drift."""
    pts, tgt, lvl_p = _setup(n=180, m=200, seed=5)
    lcfg = LoopConfig(iters=25, lr=0.01, max_break_count=15,
                      break_threshold_ratio=0.001)
    pts_valid = jnp.ones((pts.shape[0],), bool)
    t_valid = jnp.ones((tgt.shape[0],), bool)

    outs = []
    for knobs in (False, True):
        p, warped, stats = run_fused_level(
            lvl_p, pts, pts_valid, tgt, t_valid, jnp.int32(1), CFG, lcfg,
            interpret=True, mxu_dist=knobs, packed=knobs)
        outs.append((warped, stats))
    (w0, s0), (w1, s1) = outs
    assert abs(int(s0["iters"]) - int(s1["iters"])) <= 2
    assert abs(float(s0["loss"]) - float(s1["loss"])) < 5e-4
    # a near-tie flip early in the loop perturbs the Adam trajectory;
    # same band as the register_pair fused/unfused equivalence below
    assert np.abs(np.asarray(w0) - np.asarray(w1)).max() < 2e-2


def test_supports_gate_ldmk():
    from deformationpyramid_tpu.ops.fused_iteration import (
        supports_fused_iteration_ldmk)

    assert supports_fused_iteration_ldmk(CFG, 0.0, 5, 0.0)
    assert supports_fused_iteration_ldmk(CFG, 0.0, 5, 0.1)   # ldmk+chamfer
    assert not supports_fused_iteration_ldmk(CFG, 0.0, 0, 0.0)   # no ldmk
    assert not supports_fused_iteration_ldmk(CFG, 0.5, 5, 0.0)   # w_reg
    assert supports_fused_iteration_ldmk(
        NDPConfig(rotation_format="quaternion"), 0.0, 5, 0.0)
    assert not supports_fused_iteration_ldmk(
        NDPConfig(nonrigidity_est=True), 0.5, 5, 0.0)


def test_ldmk_iter_kernel_single_step():
    """One launch == loss + early-stop decision + one optax.adam step of
    the masked landmark L2 objective; done=1 holds params/moments."""
    from deformationpyramid_tpu.ops.fused_iteration import (
        _ldmk_iter_call, _round_up)

    pts, _, lvl_p = _setup(n=150, m=10)
    rng = np.random.default_rng(11)
    tgt_l = pts + jnp.asarray(rng.standard_normal(pts.shape) * 0.05,
                              jnp.float32)
    valid = jnp.asarray(rng.random(pts.shape[0]) > 0.3)
    n = pts.shape[0]
    n_pad = _round_up(max(n, 128), 128)
    xt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(pts.T)
    tgt_pad = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(tgt_l.T)
    mask = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        valid.astype(jnp.float32))
    count = jnp.maximum(jnp.sum(mask), 1.0).reshape(1, 1)
    freq = jnp.exp2(jnp.float32(1) + 1.0 + CFG.k0).reshape(1, 1)
    p_t = params_to_t(lvl_p)
    zeros = [jnp.zeros_like(a) for a in p_t]
    scal = lambda x: jnp.full((1, 1), x, jnp.float32)

    def ref_loss(p):
        w, _ = level_warp(p, pts, 1, CFG)
        sq = jnp.sum((w - tgt_l) ** 2, axis=-1)
        return jnp.sum(jnp.where(valid, sq, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1)

    newp, newm, newv, warped_t, loss, counter, done = _ldmk_iter_call(
        freq, scal(1e6), scal(0.0), scal(0.0), count, xt_pad, tgt_pad,
        mask, p_t, zeros, [jnp.zeros_like(a) for a in p_t],
        mlp_scale=CFG.mlp_scale, lr=0.01, b1=0.9, b2=0.999, eps=1e-8,
        interpret=True, motion="SE3", rotation_format="axis_angle",
        max_break=15, thr_ratio=0.001, loss_eps=1e-4)

    assert abs(float(loss[0, 0]) - float(ref_loss(lvl_p))) < 1e-6
    assert float(counter[0, 0]) == 0.0
    assert float(done[0, 0]) == 0.0
    ref_w, _ = level_warp(lvl_p, pts, 1, CFG)
    assert np.abs(np.asarray(warped_t).T[:n] - np.asarray(ref_w)).max() < 1e-5

    gref = jax.grad(ref_loss)(lvl_p)
    opt = optax.adam(0.01)
    st = opt.init(lvl_p)
    upd, _ = opt.update(gref, st, lvl_p)
    ref_p = optax.apply_updates(lvl_p, upd)
    got_p = t_to_params(list(newp))
    for k in ref_p:
        for kk in ref_p[k]:
            a, b = np.asarray(ref_p[k][kk]), np.asarray(got_p[k][kk])
            assert np.abs(a - b).max() < 1e-5, (k, kk, np.abs(a - b).max())

    # plateau path: loss_prev == loss => counter increments; done stays 0
    _, _, _, _, _, c2, d2 = _ldmk_iter_call(
        freq, loss.reshape(1, 1), scal(3.0), scal(0.0), count, xt_pad,
        tgt_pad, mask, p_t, zeros, [jnp.zeros_like(a) for a in p_t],
        mlp_scale=CFG.mlp_scale, lr=0.01, b1=0.9, b2=0.999, eps=1e-8,
        interpret=True, motion="SE3", rotation_format="axis_angle",
        max_break=15, thr_ratio=0.001, loss_eps=1e-4)
    assert float(c2[0, 0]) == 4.0 and float(d2[0, 0]) == 0.0

    # max_break reached => done, params held
    heldp, heldm, _, _, _, c3, d3 = _ldmk_iter_call(
        freq, loss.reshape(1, 1), scal(14.0), scal(0.0), count, xt_pad,
        tgt_pad, mask, p_t, zeros, [jnp.zeros_like(a) for a in p_t],
        mlp_scale=CFG.mlp_scale, lr=0.01, b1=0.9, b2=0.999, eps=1e-8,
        interpret=True, motion="SE3", rotation_format="axis_angle",
        max_break=15, thr_ratio=0.001, loss_eps=1e-4)
    assert float(d3[0, 0]) == 1.0
    for a, b in zip(heldp, p_t):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a in heldm:
        assert not np.asarray(a).any()


@pytest.mark.parametrize("motion,rot", [
    ("SE3", "axis_angle"), ("Sim3", "euler")])
def test_run_fused_level_ldmk_matches_run_adam_loop(motion, rot):
    """Full landmark level: identical early-stop counts and matching
    loss/params/warped vs the unfused loop on the same masked L2."""
    from deformationpyramid_tpu.ops.fused_iteration import (
        run_fused_level_ldmk)

    cfg = NDPConfig(m=4, k0=-6, depth=3, width=64,
                    rotation_format=rot, motion=motion)
    pts, _, _ = _setup(n=150, m=10, seed=4)
    params = init_pyramid_params(jax.random.key(4), cfg)
    lvl_p = level_params(params, 1)
    rng = np.random.default_rng(4)
    tgt_l = pts + jnp.asarray(rng.standard_normal(pts.shape) * 0.08,
                              jnp.float32)
    valid = jnp.asarray(rng.random(pts.shape[0]) > 0.2)
    lcfg = LoopConfig(iters=40, lr=0.01, max_break_count=15,
                      break_threshold_ratio=0.001)

    new_p, warped, stats = run_fused_level_ldmk(
        lvl_p, pts, valid, tgt_l, jnp.int32(1), cfg, lcfg, interpret=True)

    def loss_fn(p, it, key):
        w, _ = level_warp(p, pts, 1, cfg)
        sq = jnp.sum((w - tgt_l) ** 2, axis=-1)
        loss = jnp.sum(jnp.where(valid, sq, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1)
        return loss, w

    ref_p, ref_warped, ref_stats = run_adam_loop(loss_fn, lvl_p, lcfg,
                                                 aux_init=pts)
    assert int(stats["iters"]) == int(ref_stats["iters"])
    assert abs(float(stats["loss"]) - float(ref_stats["loss"])) < 1e-5
    assert np.abs(np.asarray(warped) - np.asarray(ref_warped)).max() < 1e-3
    for k in ref_p:
        for kk in ref_p[k]:
            a, b = np.asarray(ref_p[k][kk]), np.asarray(new_p[k][kk])
            assert np.abs(a - b).max() < 1e-3, (k, kk)


@pytest.mark.parametrize("lvl", [0, 1])
def test_run_fused_level_nonrigid_matches_run_adam_loop(lvl):
    """Nonrigidity branch (w_reg > 0): the in-kernel level>0 gate + the
    BCE-vs-zeros reg term match the unfused loss exactly — level 0 must
    behave as pure ungated chamfer (reference nets.py:131-137,
    registration.py:216-220)."""
    from deformationpyramid_tpu.solve.registration import _bce_zeros

    w_reg = 0.3
    cfg = NDPConfig(m=4, k0=-6, depth=3, width=64,
                    rotation_format="axis_angle", motion="SE3",
                    nonrigidity_est=True)
    pts, tgt, _ = _setup(n=180, m=200, seed=9)
    params = init_pyramid_params(jax.random.key(9), cfg)
    lvl_p = level_params(params, lvl)
    lcfg = LoopConfig(iters=25, lr=0.01, max_break_count=15,
                      break_threshold_ratio=0.001)
    pts_valid = jnp.ones((pts.shape[0],), bool)
    t_valid = jnp.ones((tgt.shape[0],), bool)

    new_p, warped, stats = run_fused_level(
        lvl_p, pts, pts_valid, tgt, t_valid, jnp.int32(lvl), cfg, lcfg,
        interpret=True, w_reg=w_reg)

    def loss_fn(p, it, key):
        w, nr = level_warp(p, pts, lvl, cfg)
        loss = truncated_chamfer(w, tgt, use_pallas=False)
        reg = _bce_zeros(nr, pts_valid)
        return loss + jnp.where(jnp.int32(lvl) > 0, w_reg * reg, 0.0), w

    ref_p, ref_warped, ref_stats = run_adam_loop(loss_fn, lvl_p, lcfg,
                                                 aux_init=pts)
    assert int(stats["iters"]) == int(ref_stats["iters"])
    assert abs(float(stats["loss"]) - float(ref_stats["loss"])) < 1e-4
    assert np.abs(np.asarray(warped) - np.asarray(ref_warped)).max() < 1e-3
    for k in ref_p:
        for kk in ref_p[k]:
            a, b = np.asarray(ref_p[k][kk]), np.asarray(new_p[k][kk])
            assert np.abs(a - b).max() < 1e-3, (k, kk)


def test_register_pair_nonrigid_fused_iteration_equivalence():
    """register_pair at w_reg>0 (nonrigidity estimation on) with the
    fused iteration matches the default path."""
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.solve.registration import (
        SolverConfig, register_pair)

    src, tgt, _ = make_pair(n=300, seed=3, deform=0.12)
    base = dict(pyramid=NDPConfig(m=3, k0=-6, depth=3, width=48,
                                  nonrigidity_est=True),
                iters=30, lr=0.01, max_break_count=15,
                break_threshold_ratio=0.001, samples=256, w_reg=0.2)
    outs = []
    for fi in (False, True):
        cfg = SolverConfig(**base, use_fused_iteration=fi)
        w, st = jax.jit(lambda k, s, t: register_pair(k, s, t, cfg))(
            jax.random.key(0), jnp.array(src), jnp.array(tgt))
        outs.append((np.asarray(w), np.asarray(st["loss"]),
                     np.asarray(st["iters"])))
    assert (outs[0][2] == outs[1][2]).all(), (outs[0][2], outs[1][2])
    assert np.allclose(outs[0][1], outs[1][1], atol=5e-3)
    assert np.abs(outs[0][0] - outs[1][0]).max() < 2e-2


@pytest.mark.parametrize("w_cd", [0.0, 0.5])
def test_register_pair_ldmk_fused_iteration_equivalence(w_cd):
    """register_pair in landmark mode with the fused iteration matches
    the default path — w_cd=0 takes the one-kernel pure-L2 path (LNDP
    config), w_cd>0 the two-kernel path with the landmark term in the
    glue and the truncated chamfer on the sample rows."""
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.solve.registration import (
        SolverConfig, register_pair)

    src, tgt, _ = make_pair(n=300, seed=2, deform=0.1)
    rng = np.random.default_rng(2)
    idx = rng.choice(300, 48, replace=False)
    src_l = jnp.array(src[idx])
    tgt_l = jnp.array(tgt[idx])
    lv = jnp.asarray(rng.random(48) > 0.25)
    base = dict(pyramid=NDPConfig(m=3, k0=-6, depth=3, width=48), iters=30,
                lr=0.01, max_break_count=15, break_threshold_ratio=0.001,
                samples=256, w_cd=w_cd, trunc_cd=0.25)
    outs = []
    for fi in (False, True):
        cfg = SolverConfig(**base, use_fused_iteration=fi,
                           use_fused_ldmk=fi)
        w, st = jax.jit(lambda k, s, t, ls, lt, v: register_pair(
            k, s, t, cfg, src_ldmk=ls, tgt_ldmk=lt, ldmk_valid=v))(
            jax.random.key(0), jnp.array(src), jnp.array(tgt),
            src_l, tgt_l, lv)
        outs.append((np.asarray(w), np.asarray(st["loss"]),
                     np.asarray(st["iters"])))
    assert (outs[0][2] == outs[1][2]).all(), (outs[0][2], outs[1][2])
    assert np.allclose(outs[0][1], outs[1][1], atol=5e-4)
    assert np.abs(outs[0][0] - outs[1][0]).max() < 5e-3


def test_run_fused_level_ldmk_chamfer_matches_run_adam_loop():
    """Landmark + chamfer objective (w_cd > 0): the two-kernel path with
    the landmark term folded into the glue matches the unfused loss —
    chamfer sees ONLY the sample rows, truncated at trunc_cd."""
    w_cd, trunc_cd = 0.5, 0.25
    n_l = 40
    pts, tgt, lvl_p = _setup(n=200, m=220, seed=11)
    rng = np.random.default_rng(11)
    tgt_l = pts[:n_l] + jnp.asarray(
        rng.standard_normal((n_l, 3)) * 0.05, jnp.float32)
    lv = jnp.asarray(rng.random(n_l) > 0.25)
    pts_valid = jnp.ones((pts.shape[0],), bool)
    t_valid = jnp.ones((tgt.shape[0],), bool)
    lcfg = LoopConfig(iters=25, lr=0.01, max_break_count=15,
                      break_threshold_ratio=0.001)

    new_p, warped, stats = run_fused_level(
        lvl_p, pts, pts_valid, tgt, t_valid, jnp.int32(1), CFG, lcfg,
        interpret=True, trunc=trunc_cd, n_ldmk=n_l, tgt_ldmk=tgt_l,
        ldmk_valid=lv, w_cd=w_cd)

    def loss_fn(p, it, key):
        w, _ = level_warp(p, pts, 1, CFG)
        sq = jnp.sum((w[:n_l] - tgt_l) ** 2, axis=-1)
        loss = jnp.sum(jnp.where(lv, sq, 0.0)) / jnp.maximum(
            jnp.sum(lv), 1)
        loss = loss + w_cd * truncated_chamfer(
            w[n_l:], tgt, trunc=trunc_cd, use_pallas=False)
        return loss, w

    ref_p, ref_warped, ref_stats = run_adam_loop(loss_fn, lvl_p, lcfg,
                                                 aux_init=pts)
    assert int(stats["iters"]) == int(ref_stats["iters"])
    assert abs(float(stats["loss"]) - float(ref_stats["loss"])) < 1e-4
    assert np.abs(np.asarray(warped) - np.asarray(ref_warped)).max() < 1e-3
    for k in ref_p:
        for kk in ref_p[k]:
            a, b = np.asarray(ref_p[k][kk]), np.asarray(new_p[k][kk])
            assert np.abs(a - b).max() < 1e-3, (k, kk)


def test_run_fused_nsfp_matches_run_adam_loop():
    """NSFP baseline through the generalized two-kernel iteration: the
    in-kernel MLP flow matches nsfp_flow; the full loop matches the
    unfused optimize_nsfp (same early-stop count, loss/params drift)."""
    from deformationpyramid_tpu.models.baselines import (
        NSFPConfig, init_nsfp_params, nsfp_flow)
    from deformationpyramid_tpu.ops.fused_iteration import (
        nsfp_params_to_t, nsfp_t_to_params, run_fused_nsfp)

    ncfg = NSFPConfig(width=64, n_layers=5)
    pts, tgt, _ = _setup(n=180, m=200, seed=6)
    params = init_nsfp_params(jax.random.key(6), ncfg)

    # roundtrip + kernel-level forward parity
    back = nsfp_t_to_params(nsfp_params_to_t(params))
    for a, b in zip(params, back):
        assert np.array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
        assert np.array_equal(np.asarray(a["b"]), np.asarray(b["b"]))
    xt_pad, xbig, yc, ysqb, xv, yv, freq, tm, n_pad, m_pad = _pad_inputs(
        pts, tgt)
    warped_t, _, _, _, _ = _fwd_sweep_call(
        jnp.zeros((1, 1), jnp.float32), xt_pad, xbig, yc, ysqb,
        nsfp_params_to_t(params), mlp_scale=0.0, tm=tm, interpret=True,
        model="nsfp")
    ref_warped = pts + nsfp_flow(params, pts, ncfg)
    got = np.asarray(warped_t).T[:pts.shape[0]]
    assert np.abs(got - np.asarray(ref_warped)).max() < 1e-5

    # full-loop equivalence vs the unfused loop. NSFP has no mlp_scale:
    # the flow starts O(1), so f32 trajectories decorrelate faster than
    # NDP's near-identity warp — short horizon + looser band (per-step
    # grads match to ~3e-7 relative, checked below).
    from deformationpyramid_tpu.ops.chamfer import truncated_chamfer

    lcfg = LoopConfig(iters=5, lr=0.01, max_break_count=15,
                      break_threshold_ratio=0.001)
    pts_valid = jnp.ones((pts.shape[0],), bool)
    t_valid = jnp.ones((tgt.shape[0],), bool)
    new_p, stats = run_fused_nsfp(params, pts, pts_valid, tgt, t_valid,
                                  lcfg, interpret=True)

    def loss_fn(p, it, key):
        w = pts + nsfp_flow(p, pts, ncfg)
        return truncated_chamfer(w, tgt, use_pallas=False), None

    ref_p, _, ref_stats = run_adam_loop(loss_fn, params, lcfg)
    assert int(stats["iters"]) == int(ref_stats["iters"])
    assert abs(float(stats["loss"]) - float(ref_stats["loss"])) < 1e-4
    for a, b in zip(ref_p, new_p):
        assert np.abs(np.asarray(a["w"]) - np.asarray(b["w"])).max() < 2e-2
        assert np.abs(np.asarray(a["b"]) - np.asarray(b["b"])).max() < 2e-2

    # per-step gradient parity (the guarantee behind the horizon above)
    from deformationpyramid_tpu.ops.fused_iteration import _nsfp_forward_t

    g = jnp.asarray(np.random.default_rng(6).standard_normal(
        pts.shape) * 0.1, jnp.float32)
    gref = jax.grad(lambda p: jnp.sum(
        (pts + nsfp_flow(p, pts, ncfg)) * g))(params)
    gt = nsfp_t_to_params(list(jax.grad(lambda pt: jnp.sum(
        _nsfp_forward_t(pts.T, *pt) * g.T))(nsfp_params_to_t(params))))
    for a, b in zip(gref, gt):
        for kk in ("w", "b"):
            aa, bb = np.asarray(a[kk]), np.asarray(b[kk])
            rel = np.abs(aa - bb).max() / max(np.abs(aa).max(), 1e-12)
            assert rel < 1e-5, (kk, rel)


def test_register_nsfp_fused_iteration_equivalence():
    """register_nsfp with the fused iteration matches the default path."""
    import dataclasses as _dc

    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.models.baselines import NSFPConfig
    from deformationpyramid_tpu.solve.baselines import (
        NSFPSolverConfig, register_nsfp)

    src, tgt, _ = make_pair(n=300, seed=4, deform=0.1)
    base = NSFPSolverConfig(net=NSFPConfig(width=48, n_layers=4), iters=30,
                            lr=0.01, max_break_count=15,
                            break_threshold_ratio=0.001, samples=256,
                            use_pallas=False)
    outs = []
    for fi in (False, True):
        cfg = _dc.replace(base, use_fused_iteration=fi)
        w, st = jax.jit(lambda k, s, t: register_nsfp(k, s, t, cfg))(
            jax.random.key(0), jnp.array(src), jnp.array(tgt))
        outs.append((np.asarray(w), np.asarray(st["loss"]),
                     np.asarray(st["iters"])))
    assert (outs[0][2] == outs[1][2]).all(), (outs[0][2], outs[1][2])
    assert np.allclose(outs[0][1], outs[1][1], atol=5e-3)
    assert np.abs(outs[0][0] - outs[1][0]).max() < 2e-2


def test_register_batch_fused_iteration_vmaps():
    """register_batch (the non-stream eval path) vmaps register_pair —
    the fused Pallas kernels must survive the vmap batching rule."""
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.solve.registration import (
        SolverConfig, register_batch)

    s0, t0, _ = make_pair(n=300, seed=0, deform=0.12)
    s1, t1, _ = make_pair(n=300, seed=1, deform=0.12)
    src = jnp.stack([jnp.array(s0), jnp.array(s1)])
    tgt = jnp.stack([jnp.array(t0), jnp.array(t1)])
    keys = jax.random.split(jax.random.key(0), 2)
    cfg = SolverConfig(pyramid=NDPConfig(m=2, k0=-6, depth=3, width=48),
                       iters=12, samples=256, use_fused_iteration=True)
    w, st = jax.jit(lambda k, s, t: register_batch(k, s, t, cfg))(
        keys, src, tgt)
    assert np.asarray(st["iters"]).shape == (2, 2)
    assert np.isfinite(np.asarray(w)).all()
    assert np.abs(np.asarray(w) - np.asarray(src)).max() > 1e-4


def test_register_pair_fused_iteration_equivalence():
    """register_pair with use_fused_iteration matches the default path:
    same per-level iteration counts, warped cloud within f32 drift."""
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.solve.registration import (
        SolverConfig, register_pair)

    src, tgt, _ = make_pair(n=300, seed=0, deform=0.12)
    base = dict(pyramid=NDPConfig(m=3, k0=-6, depth=3, width=48), iters=30,
                lr=0.01, max_break_count=15, break_threshold_ratio=0.001,
                samples=256)
    outs = []
    for fi in (False, True):
        cfg = SolverConfig(**base, use_fused_iteration=fi)
        w, st = jax.jit(lambda k, s, t: register_pair(k, s, t, cfg))(
            jax.random.key(0), jnp.array(src), jnp.array(tgt))
        outs.append((np.asarray(w), np.asarray(st["loss"]),
                     np.asarray(st["iters"])))
    assert (outs[0][2] == outs[1][2]).all(), (outs[0][2], outs[1][2])
    assert np.allclose(outs[0][1], outs[1][1], atol=5e-3)
    assert np.abs(outs[0][0] - outs[1][0]).max() < 2e-2


# ---------------- temporal-coherence sweep reuse ----------------

def test_knn_table_matches_bruteforce():
    from deformationpyramid_tpu.ops.fused_iteration import _BIG, _knn_table

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.standard_normal((40, 3)), jnp.float32)
    big = jnp.where(jnp.arange(40) < 36, 0.0, _BIG)  # last 4 rows invalid
    idx, nn_other = _knn_table(pts, big, 6)
    d = np.sum((np.asarray(pts)[:, None] - np.asarray(pts)[None]) ** 2, -1)
    d[:, 36:] = np.inf
    order = np.argsort(d, axis=1)[:, :6]
    for i in range(36):
        assert set(np.asarray(idx)[i]) == set(order[i]), i
        assert int(np.asarray(idx)[i, 0]) == i  # self at column 0
        assert abs(float(nn_other[i]) - d[i, order[i, 1]]) < 1e-5


def test_sweep_reuse_tiny_drift_holds_are_exact():
    """With a ~zero drift bound every cheap sub-iteration holds, so the
    reuse schedule degenerates to exact-sweep-only iterations — the
    result must match resweep_every=0 exactly (same iters/loss/params).
    This pins the halt plumbing: holds must not advance it/counter or
    touch params/moments/loss_prev."""
    pts, tgt, lvl_p = _setup(n=180, m=200, seed=5)
    lcfg = LoopConfig(iters=25, lr=0.01, max_break_count=15,
                      break_threshold_ratio=0.001)
    pv = jnp.ones((pts.shape[0],), bool)
    tv = jnp.ones((tgt.shape[0],), bool)
    base_p, base_w, base_s = run_fused_level(
        lvl_p, pts, pv, tgt, tv, jnp.int32(1), CFG, lcfg, interpret=True,
        resweep_every=0)
    re_p, re_w, re_s = run_fused_level(
        lvl_p, pts, pv, tgt, tv, jnp.int32(1), CFG, lcfg, interpret=True,
        resweep_every=4, resweep_drift=1e-12)
    assert int(base_s["iters"]) == int(re_s["iters"])
    assert float(base_s["loss"]) == float(re_s["loss"])
    assert np.array_equal(np.asarray(base_w), np.asarray(re_w))
    for k in base_p:
        for kk in base_p[k]:
            assert np.array_equal(np.asarray(base_p[k][kk]),
                                  np.asarray(re_p[k][kk])), (k, kk)


@pytest.mark.parametrize("T", [2, 4])
def test_sweep_reuse_converges_close_to_exact(T):
    """Default drift bound: the walked association tracks the exact one
    closely enough that the level converges to a similar optimum (loss
    within 10% relative, warped cloud within 5e-2)."""
    pts, tgt, lvl_p = _setup(n=180, m=200, seed=7)
    lcfg = LoopConfig(iters=40, lr=0.01, max_break_count=15,
                      break_threshold_ratio=0.001)
    pv = jnp.ones((pts.shape[0],), bool)
    tv = jnp.ones((tgt.shape[0],), bool)
    _, base_w, base_s = run_fused_level(
        lvl_p, pts, pv, tgt, tv, jnp.int32(1), CFG, lcfg, interpret=True,
        resweep_every=0)
    _, re_w, re_s = run_fused_level(
        lvl_p, pts, pv, tgt, tv, jnp.int32(1), CFG, lcfg, interpret=True,
        resweep_every=T)
    bl, rl = float(base_s["loss"]), float(re_s["loss"])
    assert np.isfinite(rl)
    assert rl < bl * 1.10 + 1e-4, (bl, rl)
    # random gaussian clouds (not surfaces) make the association genuinely
    # ambiguous, so trajectories diverge more than on real scans; the loss
    # criterion above is the convergence-quality check, this one only pins
    # "same basin"
    assert np.abs(np.asarray(base_w) - np.asarray(re_w)).max() < 0.15


def test_register_pair_sweep_reuse_end_to_end():
    """Full pyramid with sweep_reuse: converges like the exact path
    (final EPE within 2x) and runs under vmap (static schedule)."""
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.solve.registration import (
        SolverConfig, register_batch, register_pair)

    src, tgt, flow = make_pair(n=300, seed=0, deform=0.12)
    base = dict(pyramid=NDPConfig(m=3, k0=-6, depth=3, width=48), iters=30,
                lr=0.01, max_break_count=15, break_threshold_ratio=0.001,
                samples=256, use_fused_iteration=True)
    epes = []
    for t in (0, 4):
        cfg = SolverConfig(**base, sweep_reuse=t)
        w, st = jax.jit(lambda k, s, t_: register_pair(k, s, t_, cfg))(
            jax.random.key(0), jnp.array(src), jnp.array(tgt))
        epes.append(float(np.linalg.norm(
            (np.asarray(w) - src) - flow, axis=1).mean()))
    init = float(np.linalg.norm(flow, axis=1).mean())
    assert epes[1] < init * 0.7, (init, epes)       # it actually converges
    assert epes[1] < max(epes[0] * 2.0, 0.02), epes  # and tracks exact

    # vmap survival (the batched production path)
    cfg = SolverConfig(**dict(base, iters=8), sweep_reuse=4)
    keys = jax.random.split(jax.random.key(0), 2)
    srcs = jnp.stack([jnp.array(src)] * 2)
    tgts = jnp.stack([jnp.array(tgt)] * 2)
    w, st = jax.jit(lambda k, s, t_: register_batch(k, s, t_, cfg))(
        keys, srcs, tgts)
    assert np.isfinite(np.asarray(w)).all()
