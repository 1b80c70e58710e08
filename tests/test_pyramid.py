"""Property tests for the NDP pyramid model (SURVEY.md §4c)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deformationpyramid_tpu.models.pyramid import (
    NDPConfig, init_pyramid_params, level_params, level_warp, posenc, warp,
)


def _points(n=128, seed=0):
    return jnp.array(np.random.default_rng(seed).normal(size=(n, 3)) * 0.5, jnp.float32)


@pytest.mark.parametrize("motion", ["SE3", "Sim3", "sflow"])
@pytest.mark.parametrize("fmt", ["axis_angle", "euler"])
def test_warp_at_init_is_near_identity(motion, fmt):
    """mlp_scale=0.001 => optimization starts near the identity warp
    (reference model/nets.py:106-107).

    quaternion/6D are excluded: the reference *normalizes* those tiny head
    outputs (unit quaternion / Gram-Schmidt frame, nets.py:154-159), so
    those formats start at a random rotation — a reference quirk we
    reproduce (see test below).
    """
    cfg = NDPConfig(m=4, motion=motion, rotation_format=fmt)
    params = init_pyramid_params(jax.random.key(0), cfg)
    x = _points()
    out, _ = jax.jit(lambda p, x: warp(p, x, cfg))(params, x)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out - x).max()) < 0.05


def test_quaternion_init_is_valid_rotation_but_not_identity():
    cfg = NDPConfig(m=2, rotation_format="quaternion")
    params = init_pyramid_params(jax.random.key(0), cfg)
    x = _points()
    out, _ = jax.jit(lambda p, x: warp(p, x, cfg))(params, x)
    assert np.isfinite(np.asarray(out)).all()
    # norms preserved (pure rotation + tiny translation), points move a lot
    n_in = np.linalg.norm(np.asarray(x), axis=-1)
    n_out = np.linalg.norm(np.asarray(out), axis=-1)
    assert np.allclose(n_in, n_out, atol=0.05)


def test_posenc_frequency_doubles_per_level():
    x = jnp.array([[0.1, 0.2, 0.3]])
    k0 = -8
    for lvl in range(3):
        pe = posenc(x, lvl, k0)
        freq = 2.0 ** (lvl + 1 + k0)
        expect = np.array([
            np.sin(0.1 * freq), np.cos(0.1 * freq),
            np.sin(0.2 * freq), np.cos(0.2 * freq),
            np.sin(0.3 * freq), np.cos(0.3 * freq),
        ])
        assert np.allclose(np.asarray(pe)[0], expect, atol=1e-6)


def test_param_stacking_shapes():
    cfg = NDPConfig(m=9, depth=3, width=128, motion="Sim3", nonrigidity_est=True)
    p = init_pyramid_params(jax.random.key(1), cfg)
    assert p["input"]["w"].shape == (9, 6, 128)
    assert p["hidden"]["w"].shape == (9, 2, 128, 128)
    assert p["rot"]["w"].shape == (9, 128, 3)
    assert p["trn"]["w"].shape == (9, 128, 3)
    assert p["scale"]["w"].shape == (9, 128, 1)
    assert p["nr"]["w"].shape == (9, 128, 1)


def test_level_warp_composition_matches_full_warp():
    cfg = NDPConfig(m=3)
    params = init_pyramid_params(jax.random.key(2), cfg)
    x = _points(seed=3)
    full, _ = warp(params, x, cfg)
    step = x
    for lvl in range(cfg.m):
        step, _ = level_warp(level_params(params, lvl), step, lvl, cfg)
    assert np.allclose(np.asarray(full), np.asarray(step), atol=1e-6)


def test_nonrigidity_gate_off_at_level0():
    cfg = NDPConfig(m=2, nonrigidity_est=True)
    params = init_pyramid_params(jax.random.key(3), cfg)
    x = _points(seed=4)
    # level 0: ungated warp == plain SE3 warp even with nr branch present
    out0, nr0 = level_warp(level_params(params, 0), x, 0, cfg)
    cfg_plain = NDPConfig(m=2, nonrigidity_est=False)
    out_plain, _ = level_warp(
        {k: v for k, v in level_params(params, 0).items() if k != "nr"},
        x, 0, cfg_plain)
    assert np.allclose(np.asarray(out0), np.asarray(out_plain), atol=1e-7)
    # level 1 gates: warp pulled toward input by nr in (0, 1)
    out1, nr1 = level_warp(level_params(params, 1), x, 1, cfg)
    assert ((np.asarray(nr1) > 0) & (np.asarray(nr1) < 1)).all()


def test_sim3_scale_starts_at_one():
    cfg = NDPConfig(m=2, motion="Sim3")
    params = init_pyramid_params(jax.random.key(4), cfg)
    x = _points(seed=5) * 10.0  # large cloud would amplify scale error
    out, _ = level_warp(level_params(params, 0), x, 0, cfg)
    # scale = 0.001*s+1 ~ 1 => norm ratio close to 1
    ratio = float(jnp.linalg.norm(out) / jnp.linalg.norm(x))
    assert abs(ratio - 1.0) < 0.01


def test_transposed_level_warp_matches():
    """level_warp_t ([3,N] layout) reproduces level_warp for every motion
    and rotation format it supports (same params, same math — only the
    matmul reduction layout differs)."""
    from deformationpyramid_tpu.models.pyramid import level_warp_t

    for motion, fmt in [("SE3", "axis_angle"), ("SE3", "quaternion"),
                        ("Sim3", "axis_angle"), ("sflow", "axis_angle"),
                        ("SE3", "6D"), ("SE3", "euler")]:
        cfg = NDPConfig(m=2, motion=motion, rotation_format=fmt)
        params = init_pyramid_params(jax.random.key(7), cfg)
        x = _points(seed=8, n=257)
        ref, _ = level_warp(level_params(params, 1), x, 1, cfg)
        out_t = level_warp_t(level_params(params, 1), x.T, 1, cfg)
        # 6D's Gram-Schmidt amplifies f32 rounding to ~7e-6
        assert np.allclose(np.asarray(out_t.T), np.asarray(ref),
                           atol=1e-5), (motion, fmt)


def test_transposed_solver_path_matches_metrics():
    """register_pair with the [3,N] hot path converges to the same result
    as the [N,3] path (metric-level: same early-stop iters, close loss)."""
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.solve.registration import (
        SolverConfig, register_pair,
    )

    src, tgt, _ = make_pair(n=300, seed=3, deform=0.08)
    outs = []
    for t in (False, True):
        cfg = SolverConfig(pyramid=NDPConfig(m=3, k0=-4, depth=2, width=32),
                           iters=40, samples=256, use_pallas=False,
                           transposed=t)
        w, st = jax.jit(lambda k, s, tt: register_pair(k, s, tt, cfg))(
            jax.random.key(0), jnp.array(src), jnp.array(tgt))
        outs.append((np.asarray(w), np.asarray(st["loss"])))
    assert np.abs(outs[0][0] - outs[1][0]).max() < 2e-2
    assert np.allclose(outs[0][1], outs[1][1], atol=5e-3)


def test_warp_numpy_matches_device_warp():
    """Host-side numpy full warp (eval --host-metrics mode) reproduces the
    compiled warp for SE3/Sim3/sflow axis-angle configs."""
    from deformationpyramid_tpu.models.pyramid import warp, warp_numpy

    for motion in ("SE3", "Sim3", "sflow"):
        cfg = NDPConfig(m=3, k0=-4, depth=3, width=32, motion=motion)
        params = init_pyramid_params(jax.random.key(11), cfg)
        x = _points(seed=12, n=300)
        ref, _ = warp(params, x, cfg)
        out = warp_numpy(params, np.asarray(x), cfg)
        assert np.abs(out - np.asarray(ref)).max() < 1e-5, motion
