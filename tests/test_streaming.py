"""Continuous-batching solver: equivalence with the scan-based solver."""
import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.data.synthetic import make_batch
from deformationpyramid_tpu.models.pyramid import NDPConfig
from deformationpyramid_tpu.solve.registration import SolverConfig, register_pair
from deformationpyramid_tpu.solve.streaming import register_stream

CFG = SolverConfig(pyramid=NDPConfig(m=3, k0=-4, depth=2, width=32),
                   iters=40, samples=128, use_pallas=False)


def test_streaming_matches_scan_solver_per_pair():
    """Same key -> same subsample/init -> near-identical final warp."""
    srcs, tgts, _ = make_batch(1, n=128, seed=3, deform=0.1)
    key = jax.random.key(7)
    w_scan, stats = jax.jit(lambda k, s, t: register_pair(k, s, t, CFG))(
        key, jnp.array(srcs[0]), jnp.array(tgts[0]))
    # align RNG with register_pair by driving the stream primitives directly
    from deformationpyramid_tpu.solve.streaming import make_stream_fns

    multi_step, refill, harvest, init_one = make_stream_fns(CFG, k_inner=16)
    st = init_one(key, jnp.array(srcs[0]), jnp.array(tgts[0]))
    state_b = jax.tree.map(lambda x: x[None], st)
    for _ in range(40):  # 3 levels x 40 iters / 16 per call < 8 calls; extra ok
        state_b = multi_step(state_b)
        if bool(np.asarray(state_b["done"])[0]):
            break
    assert bool(np.asarray(state_b["done"])[0])
    w_stream, total_iters = harvest(state_b, 0)
    diff = np.abs(np.asarray(w_stream) - np.asarray(w_scan))
    # identical RNG/init/update rules; only fp reassociation differs
    assert diff.max() < 2e-2, diff.max()
    assert diff.mean() < 5e-3, diff.mean()
    # same iteration counts as the scan solver's per-level sum
    assert int(total_iters) == int(np.asarray(stats["iters"]).sum())


def test_streaming_throughput_path_many_pairs():
    srcs, tgts, flows = make_batch(6, n=128, seed=0, deform=0.1)
    pairs = [(srcs[i], tgts[i]) for i in range(6)]
    res = register_stream(pairs, CFG, n_slots=3, k_inner=16,
                          key=jax.random.key(0))
    for i, r in enumerate(res):
        assert r is not None and np.isfinite(r).all()
        epe0 = np.linalg.norm(flows[i], axis=1).mean()
        epe = np.linalg.norm((r - srcs[i]) - flows[i], axis=1).mean()
        assert epe < 0.6 * epe0, (i, epe0, epe)
