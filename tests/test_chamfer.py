"""Golden tests for the truncated Chamfer loss (SURVEY.md §4b).

Pins the reference quirks: truncation on *squared* distance, L1 (sqrt)
point reduction, lengths-mean over true counts.
"""
import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.ops.chamfer import truncated_chamfer, batched_truncated_chamfer
from deformationpyramid_tpu.ops.knn import nn_argmin_xla


def brute_chamfer(x, y, trunc=1e9):
    d = ((x[:, None] - y[None]) ** 2).sum(-1)
    dx, dy = d.min(1), d.min(0)
    dx = np.where(dx >= trunc, 0.0, dx)
    dy = np.where(dy >= trunc, 0.0, dy)
    return np.sqrt(dx).mean() + np.sqrt(dy).mean()


def test_chamfer_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 3)).astype(np.float32)
    y = rng.normal(size=(130, 3)).astype(np.float32)
    got = float(truncated_chamfer(jnp.array(x), jnp.array(y)))
    assert abs(got - brute_chamfer(x, y)) < 1e-5


def test_chamfer_hand_computed():
    # two points each, distinct NNs
    x = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    y = jnp.array([[0.0, 0.5, 0], [1.0, 0, 1.0]])
    # d(x0,y0)=0.25 d(x0,y1)=2; d(x1,y0)=1.25 d(x1,y1)=1
    # cham_x = (0.5 + 1)/2 ; cham_y = (0.5 + 1)/2
    expect = (0.5 + 1.0) / 2 * 2
    got = float(truncated_chamfer(x, y))
    assert abs(got - expect) < 1e-6


def test_truncation_on_squared_distance():
    x = jnp.array([[0.0, 0, 0]])
    y = jnp.array([[0.6, 0, 0]])
    # squared dist 0.36; trunc=0.25 squared -> dropped both sides -> 0
    got = float(truncated_chamfer(x, y, trunc=0.25))
    assert got == 0.0
    # trunc above squared dist keeps it: 0.6 + 0.6
    got2 = float(truncated_chamfer(x, y, trunc=0.5))
    assert abs(got2 - 1.2) < 1e-6


def test_chamfer_zero_at_identical_clouds():
    x = jnp.array(np.random.default_rng(2).normal(size=(64, 3)), jnp.float32)
    got = float(truncated_chamfer(x, x))
    assert got < 1e-4


def test_masked_chamfer_ignores_padding():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 3)).astype(np.float32)
    y = rng.normal(size=(50, 3)).astype(np.float32)
    xp = np.concatenate([x, np.full((10, 3), 77.0, np.float32)])
    yp = np.concatenate([y, np.full((6, 3), -88.0, np.float32)])
    xv = np.arange(50) < 40
    yv = np.arange(56) < 50
    got = float(truncated_chamfer(jnp.array(xp), jnp.array(yp),
                                  x_valid=jnp.array(xv), y_valid=jnp.array(yv)))
    assert abs(got - brute_chamfer(x, y)) < 1e-5


def test_batched_matches_mean_of_pairs():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, 30, 3)).astype(np.float32)
    y = rng.normal(size=(3, 40, 3)).astype(np.float32)
    per = [brute_chamfer(x[i], y[i]) for i in range(3)]
    got = float(batched_truncated_chamfer(jnp.array(x), jnp.array(y)))
    assert abs(got - np.mean(per)) < 1e-5


def test_gradient_matches_finite_difference():
    rng = np.random.default_rng(5)
    x = jnp.array(rng.normal(size=(20, 3)), jnp.float32)
    y = jnp.array(rng.normal(size=(25, 3)), jnp.float32)

    f = lambda x_: truncated_chamfer(x_, y)
    g = jax.grad(f)(x)
    eps = 1e-3
    for (i, j) in [(0, 0), (5, 2), (19, 1)]:
        xp = x.at[i, j].add(eps)
        xm = x.at[i, j].add(-eps)
        fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
        assert abs(fd - float(g[i, j])) < 5e-3


def test_nn_argmin_xla_correct():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(37, 3)).astype(np.float32)
    y = rng.normal(size=(53, 3)).astype(np.float32)
    d = ((x[:, None] - y[None]) ** 2).sum(-1)
    sq, idx = nn_argmin_xla(jnp.array(x), jnp.array(y))
    assert (np.asarray(idx) == d.argmin(1)).all()
    assert np.allclose(np.asarray(sq), d.min(1), atol=1e-5)


def test_nn_argmin_pallas_interpret_mode():
    """Validate the Pallas kernel logic via the interpreter on CPU."""
    from deformationpyramid_tpu.ops import knn

    rng = np.random.default_rng(7)
    x = rng.normal(size=(300, 3)).astype(np.float32)
    y = rng.normal(size=(700, 3)).astype(np.float32)
    d = ((x[:, None] - y[None]) ** 2).sum(-1)

    import functools
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        knn._nn_argmin_pallas_padded.clear_cache()
        sq, idx = knn.nn_argmin_pallas(jnp.array(x), jnp.array(y))
    finally:
        pl.pallas_call = orig
        knn._nn_argmin_pallas_padded.clear_cache()
    assert (np.asarray(idx) == d.argmin(1)).all()
    assert np.allclose(np.asarray(sq), d.min(1), atol=1e-4)


def test_nn_argmin_dual_interpret_large_sizes():
    """Tiled dual kernel, ALL variants: y-tiling covers every row (incl.
    non-2048-multiple sizes — the m_pad/tm divisibility regression).
    On this continuous random data no near-ties exist, so v3's packed
    selection must match v1/XLA exactly."""
    import functools
    import jax.experimental.pallas as pl
    from deformationpyramid_tpu.ops import knn

    rng = np.random.default_rng(11)
    orig = pl.pallas_call
    caches = (knn._nn_dual_pallas_padded, knn._nn_dual_pallas_padded_v2,
              knn._nn_dual_pallas_padded_v3, knn._nn_dual_pallas_padded_v4)
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        for c in caches:
            c.clear_cache()
        def check_idx(idx, dmat, variant, axis_min, tag):
            idx = np.asarray(idx)
            ref = dmat.argmin(1)
            if variant in ("v1", "v2"):
                assert (idx == ref).all(), (variant, tag)
                return
            # v3/v4 may flip near-ties only: chosen distance within the
            # packing's 1.2e-4-RELATIVE band (v4 adds the bf16x3 matmul's
            # ~1.5e-5-absolute rounding, scale ~1 on this data)
            chosen = np.take_along_axis(dmat, idx[:, None], 1)[:, 0]
            rel = (chosen - axis_min) / np.maximum(axis_min, 1e-30)
            tol = 3e-4 if variant in ("v3", "v4h") else 1e-3
            assert rel.max() < tol, (variant, tag, rel.max())

        for variant in ("v1", "v2", "v3", "v4", "v4h"):
            for n, m in [(300, 700), (600, 2500), (130, 150)]:
                x = rng.normal(size=(n, 3)).astype(np.float32)
                y = rng.normal(size=(m, 3)).astype(np.float32)
                d = ((x[:, None] - y[None]) ** 2).sum(-1)
                rd, ri, cd, ci = knn.nn_argmin_dual_pallas(
                    jnp.array(x), jnp.array(y), variant=variant)
                check_idx(ri, d, variant, d.min(1), (n, m, "row"))
                check_idx(ci, d.T, variant, d.min(0), (n, m, "col"))
                assert np.allclose(np.asarray(rd), d.min(1), atol=1e-4)
                assert np.allclose(np.asarray(cd), d.min(0), atol=1e-4)
    finally:
        pl.pallas_call = orig
        for c in caches:
            c.clear_cache()


def test_packed_minargmin_semantics():
    """The v3 packing invariants, pure jnp: for d >= 0 the f32 bit pattern
    is monotone, truncating 11 mantissa bits only flips <=1.2e-4-relative
    near-ties, and exact ties resolve first-index-wins (v1/XLA parity)."""
    rng = np.random.default_rng(0)
    d = jnp.asarray(np.abs(rng.standard_normal((64, 256))).astype(np.float32))
    # plant an exact tie AT row 0's minimum: the smaller index must win
    d = d.at[0, 10].set(jnp.min(d[0]))

    low = jnp.int32(0x7FF)
    bits = jax.lax.bitcast_convert_type(jnp.maximum(d, 0.0), jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    mn = jnp.min((bits & ~low) | cols, axis=1)
    idx_packed = np.asarray(mn & low)
    dist_packed = np.asarray(
        jax.lax.bitcast_convert_type(mn & ~low, jnp.float32))

    dn = np.asarray(d)
    idx_ref = dn.argmin(1)
    flips = idx_packed != idx_ref
    if flips.any():
        da = dn[np.arange(64), idx_ref][flips]
        db = dn[np.arange(64), idx_packed][flips]
        assert (np.abs(db - da) / np.maximum(da, 1e-30)).max() < 3e-4
    # truncation only ever shrinks, by < 2^-11 relative
    mins = dn.min(1)
    assert (dist_packed <= mins).all()
    assert (dist_packed >= mins * (1 - 2.0 ** -11)).all()
    assert idx_packed[0] == 10 == int(idx_ref[0])


def test_chamfer_normals_cosine_term():
    """Two-sided 1-|cos| normals term, zeroed by the same truncation mask
    (reference loss.py:200-217; computed there but dropped at return)."""
    from deformationpyramid_tpu.ops.chamfer import truncated_chamfer

    x = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [5.0, 0, 0]])
    y = jnp.array([[0.1, 0, 0], [1.1, 0, 0]])
    xn = jnp.array([[0.0, 0, 1], [0.0, 1, 0], [1.0, 0, 0]])
    # NN of x0 is y0, NN of x1 is y1; x2 is truncated (d^2=15.21 > 1)
    yn = jnp.array([[0.0, 0, 1], [1.0, 0, 0]])
    dist, norm = truncated_chamfer(x, y, trunc=1.0, use_pallas=False,
                                   x_normals=xn, y_normals=yn,
                                   return_normals=True)
    # x-side: x0 aligned (0), x1 orthogonal (1), x2 truncated (0) -> mean 1/3
    # y-side: y0->x0 aligned (0), y1->x1 orthogonal (1) -> mean 1/2
    assert np.isclose(float(norm), 1 / 3 + 1 / 2, atol=1e-5)
    # distance term unchanged by normals
    d_only = truncated_chamfer(x, y, trunc=1.0, use_pallas=False)
    assert np.isclose(float(dist), float(d_only), atol=1e-7)
    # antiparallel normals count as aligned (abs cosine)
    dist2, norm2 = truncated_chamfer(
        x, y, trunc=1.0, use_pallas=False,
        x_normals=-xn, y_normals=yn, return_normals=True)
    assert np.isclose(float(norm2), float(norm), atol=1e-6)


def test_chamfer_near_zero_floor_precision():
    """Regression test for the TPU argmin precision bug (round 2): the
    distance matmul must run at Precision.HIGHEST or the MXU's default
    bf16 pass flips argmin choices below ~1e-3, flooring the loss at
    sqrt(1e-3) ~= 0.03 instead of the f32 floor ~3e-4. Trivial on CPU;
    load-bearing on TPU."""
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(2000, 3)), jnp.float32)
    x2 = x + 1e-4 * jnp.array(rng.normal(size=(2000, 3)), jnp.float32)
    c = float(truncated_chamfer(x, x2))
    assert c < 1e-3, c


def test_fused_chamfer_matches_reference_path():
    """chamfer_l1_fused (one-kernel loss + in-sweep scatter gradient) must
    match truncated_chamfer's value and query-point gradient exactly (both
    are f32; only distance-rounding differs)."""
    from deformationpyramid_tpu.ops.chamfer_fused import chamfer_l1_fused

    rng = np.random.default_rng(3)
    for n, m, trunc in [(200, 300, 1e9), (513, 1025, 1e9), (300, 200, 0.05)]:
        x = jnp.array(rng.normal(size=(n, 3)), jnp.float32) * 0.5
        y = jnp.array(rng.normal(size=(m, 3)), jnp.float32) * 0.5
        xv = jnp.array(rng.random(n) > 0.1)
        yv = jnp.array(rng.random(m) > 0.1)
        ref = truncated_chamfer(x, y, x_valid=xv, y_valid=yv, trunc=trunc,
                                use_pallas=False)
        fus = chamfer_l1_fused(x, y, x_valid=xv, y_valid=yv, trunc=trunc,
                               interpret=True)
        assert np.isclose(float(ref), float(fus), atol=1e-6), (n, m, trunc)
        gref = jax.grad(lambda q: truncated_chamfer(
            q, y, x_valid=xv, y_valid=yv, trunc=trunc, use_pallas=False))(x)
        gfus = jax.grad(lambda q: chamfer_l1_fused(
            q, y, x_valid=xv, y_valid=yv, trunc=trunc, interpret=True))(x)
        assert float(jnp.abs(gref - gfus).max()) < 1e-5, (n, m, trunc)


def test_fused_chamfer_solver_equivalence():
    """register_pair trajectories with/without the fused chamfer loss agree
    (identical early-stop iteration counts, loss within f32 drift)."""
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.models.pyramid import NDPConfig
    from deformationpyramid_tpu.solve.registration import (
        SolverConfig, register_pair)

    src, tgt, _ = make_pair(n=400, seed=0, deform=0.12)
    base = dict(pyramid=NDPConfig(m=4, k0=-6, depth=2, width=48), iters=40,
                lr=0.01, max_break_count=15, break_threshold_ratio=0.001,
                samples=256)
    outs = []
    for fc in (False, True):
        cfg = SolverConfig(**base, use_fused_chamfer=fc)
        w, st = jax.jit(lambda k, s, t: register_pair(k, s, t, cfg))(
            jax.random.key(0), jnp.array(src), jnp.array(tgt))
        outs.append((np.asarray(w), np.asarray(st["loss"]),
                     np.asarray(st["iters"])))
    assert (outs[0][2] == outs[1][2]).all(), (outs[0][2], outs[1][2])
    # losses drift by compounded f32 rounding through 40 chaotic Adam
    # steps (the fused sweep also uses exact |x-y|^2 distances — only the
    # reduction ordering differs from the gather path); equivalence is
    # metric-level, mirroring the reference-parity tolerance philosophy
    assert np.allclose(outs[0][1], outs[1][1], atol=5e-3), (outs[0][1],
                                                            outs[1][1])
    assert np.abs(outs[0][0] - outs[1][0]).max() < 2e-2
