"""End-to-end registration convergence on synthetic pairs (SURVEY.md §4d).

Small configs keep CPU runtime in check; the semantics under test (level
scan, while_loop Adam, early stop, landmark mode) are identical to the full
config used on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.data.synthetic import make_pair, make_batch
from deformationpyramid_tpu.metrics.flow import compute_flow_metrics
from deformationpyramid_tpu.models.pyramid import NDPConfig
from deformationpyramid_tpu.solve.registration import (
    SolverConfig, register_pair, register_batch,
)

SMALL = SolverConfig(
    pyramid=NDPConfig(m=4, k0=-4, depth=2, width=32),
    iters=60, samples=256, use_pallas=False,
)


def test_registration_reduces_chamfer_and_epe():
    src, tgt, flow_gt = make_pair(n=256, seed=0, deform=0.12)
    warped, stats = jax.jit(
        lambda k, s, t: register_pair(k, s, t, SMALL)
    )(jax.random.key(0), jnp.array(src), jnp.array(tgt))
    warped = np.asarray(warped)
    flow = warped - src
    epe_before = np.linalg.norm(flow_gt, axis=-1).mean()
    epe_after = np.linalg.norm(flow - flow_gt, axis=-1).mean()
    assert np.isfinite(warped).all()
    assert epe_after < 0.5 * epe_before, (epe_before, epe_after)
    # stats carry per-level iteration counts
    assert stats["iters"].shape == (SMALL.pyramid.m,)
    assert (np.asarray(stats["iters"]) >= 1).all()


def test_early_stop_engages_on_easy_rigid_pair():
    src, tgt, _ = make_pair(n=256, seed=1, deform=0.02, rigid=True)
    _, stats = jax.jit(
        lambda k, s, t: register_pair(k, s, t, SMALL)
    )(jax.random.key(1), jnp.array(src), jnp.array(tgt))
    iters = np.asarray(stats["iters"])
    # plateau break must trigger well before the iteration cap on some level
    assert (iters < SMALL.iters).any(), iters


def test_batched_matches_single_pair():
    srcs, tgts, _ = make_batch(2, n=128, seed=7, deform=0.1)
    keys = jax.random.split(jax.random.key(2), 2)
    warped_b, stats_b = jax.jit(
        lambda k, s, t: register_batch(k, s, t, SMALL)
    )(keys, jnp.array(srcs), jnp.array(tgts))
    warped_0, _ = jax.jit(
        lambda k, s, t: register_pair(k, s, t, SMALL)
    )(keys[0], jnp.array(srcs[0]), jnp.array(tgts[0]))
    # Batched while_loop masking must not change per-pair semantics. Exact
    # bitwise equality is not expected: vmap changes reduction/fusion order
    # and tiny fp differences amplify over ~240 Adam steps. Require
    # metric-level agreement (points live on a unit-scale cloud).
    diff = np.abs(np.asarray(warped_b[0]) - np.asarray(warped_0))
    assert diff.max() < 0.02, diff.max()
    assert diff.mean() < 0.005, diff.mean()


def test_landmark_mode_converges():
    src, tgt, flow_gt = make_pair(n=200, seed=3, deform=0.1)
    # perfect landmarks on a subset: solver should chase them
    idx = np.arange(0, 200, 4)
    cfg = SolverConfig(pyramid=SMALL.pyramid, iters=60, samples=128,
                       w_cd=0.0, use_pallas=False)
    warped, _ = jax.jit(
        lambda k, s, t, ls, lt, lv: register_pair(
            k, s, t, cfg, src_ldmk=ls, tgt_ldmk=lt, ldmk_valid=lv)
    )(jax.random.key(4), jnp.array(src), jnp.array(tgt),
      jnp.array(src[idx]), jnp.array(tgt[idx]), jnp.ones(len(idx), bool))
    flow = np.asarray(warped) - src
    epe = np.linalg.norm(flow - flow_gt, axis=-1).mean()
    assert epe < 0.5 * np.linalg.norm(flow_gt, axis=-1).mean()


def test_padded_invalid_points_do_not_affect_result():
    src, tgt, _ = make_pair(n=128, seed=5, deform=0.1)
    pad = np.full((32, 3), 123.0, np.float32)
    src_p = np.concatenate([src, pad])
    tgt_p = np.concatenate([tgt, pad])
    sv = np.arange(160) < 128
    run = jax.jit(lambda k, s, t, svv, tvv: register_pair(k, s, t, SMALL, svv, tvv))
    w_pad, _ = run(jax.random.key(6), jnp.array(src_p), jnp.array(tgt_p),
                   jnp.array(sv), jnp.array(sv))
    w_ref, _ = jax.jit(lambda k, s, t: register_pair(k, s, t, SMALL))(
        jax.random.key(6), jnp.array(src), jnp.array(tgt))
    # same RNG key but different shapes -> different subsample; check the
    # padded run is still finite + close in metric terms rather than bitwise
    flow_pad = np.asarray(w_pad)[:128] - src
    flow_ref = np.asarray(w_ref) - src
    assert np.isfinite(np.asarray(w_pad)[:128]).all()
    assert abs(np.linalg.norm(flow_pad, axis=-1).mean()
               - np.linalg.norm(flow_ref, axis=-1).mean()) < 0.05


def test_flow_metrics_definitions():
    gt = jnp.array([[1.0, 0, 0], [0.1, 0, 0], [0, 0, 0.001]])
    pred = jnp.array([[1.0, 0.02, 0], [0.2, 0, 0], [0, 0, 0.5]])
    m = compute_flow_metrics(pred, gt, overlap=jnp.array([True, True, False]))
    # epe in cm units (x100)
    errs = np.linalg.norm(np.asarray(pred - gt), axis=-1)
    assert abs(float(m["full-epe"]) - errs.mean() * 100) < 1e-4
    assert 0.0 <= float(m["full-AccS"]) <= 100.0
    assert set(k.split("-")[0] for k in m) == {"full", "vis", "occ"}


def test_registration_with_nonrigidity_regularizer():
    """w_reg > 0 activates the nonrigidity branch + BCE regularizer
    (reference registration.py:216-220); solver must still converge."""
    from deformationpyramid_tpu.models.pyramid import NDPConfig
    src, tgt, flow_gt = make_pair(n=200, seed=8, deform=0.1)
    cfg = SolverConfig(
        pyramid=NDPConfig(m=3, k0=-4, depth=2, width=32, nonrigidity_est=True),
        iters=40, samples=128, w_reg=1e-4, use_pallas=False)
    warped, stats = jax.jit(lambda k, s, t: register_pair(k, s, t, cfg))(
        jax.random.key(0), jnp.array(src), jnp.array(tgt))
    assert np.isfinite(np.asarray(warped)).all()
    epe0 = np.linalg.norm(flow_gt, axis=-1).mean()
    epe = np.linalg.norm((np.asarray(warped) - src) - flow_gt, axis=-1).mean()
    assert epe < 0.6 * epe0, (epe0, epe)
