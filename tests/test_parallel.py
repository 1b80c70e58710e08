"""Multi-device sharding tests on the 8-device virtual CPU mesh (§4e)."""
import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deformationpyramid_tpu.data.synthetic import make_batch
from deformationpyramid_tpu.models.pyramid import NDPConfig
from deformationpyramid_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from deformationpyramid_tpu.parallel.batched import (
    register_sharded, aggregate_metrics_sharded, sharded_nn_min,
)
from deformationpyramid_tpu.solve.registration import SolverConfig

TINY = SolverConfig(
    pyramid=NDPConfig(m=2, k0=-3, depth=2, width=16),
    iters=20, samples=64, use_pallas=False,
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape[DATA_AXIS] == 4 and mesh2.shape[MODEL_AXIS] == 2


def test_register_sharded_over_data_axis():
    mesh = make_mesh()  # 8 x 1
    b = 8
    srcs, tgts, _ = make_batch(b, n=64, seed=0, deform=0.08)
    keys = jax.random.split(jax.random.key(0), b)
    fn = register_sharded(mesh, TINY)
    warped, stats = fn(keys, jnp.array(srcs), jnp.array(tgts),
                       jnp.ones((b, 64), bool), jnp.ones((b, 64), bool))
    assert warped.shape == (b, 64, 3)
    assert np.isfinite(np.asarray(warped)).all()
    # each pair actually optimized (moved off identity)
    move = np.abs(np.asarray(warped) - srcs).max(axis=(1, 2))
    assert (move > 1e-4).all()


def test_register_sharded_fused_iteration():
    """The fused-iteration Pallas kernels must survive shard_map over the
    data axis (pairs sharded across the 8-device mesh)."""
    import dataclasses

    mesh = make_mesh()
    b = 8
    srcs, tgts, _ = make_batch(b, n=64, seed=3, deform=0.08)
    keys = jax.random.split(jax.random.key(3), b)
    cfg = dataclasses.replace(TINY, use_fused_iteration=True)
    fn = register_sharded(mesh, cfg)
    warped, stats = fn(keys, jnp.array(srcs), jnp.array(tgts),
                       jnp.ones((b, 64), bool), jnp.ones((b, 64), bool))
    assert warped.shape == (b, 64, 3)
    assert np.isfinite(np.asarray(warped)).all()
    move = np.abs(np.asarray(warped) - srcs).max(axis=(1, 2))
    assert (move > 1e-4).all()


def test_metric_psum_aggregation_matches_local():
    mesh = make_mesh()
    b, n = 8, 32
    rng = np.random.default_rng(1)
    flow = rng.normal(size=(b, n, 3)).astype(np.float32) * 0.05
    gt = flow + rng.normal(size=(b, n, 3)).astype(np.float32) * 0.01
    mask = np.ones((b, n), bool)
    agg = aggregate_metrics_sharded(mesh)
    sums = agg(jnp.array(flow), jnp.array(gt), jnp.array(mask))
    l2 = np.linalg.norm(flow.reshape(-1, 3) - gt.reshape(-1, 3), axis=-1)
    assert abs(float(sums["epe_sum"]) - l2.sum()) < 1e-3
    assert float(sums["count"]) == b * n


def test_sharded_nn_min_matches_dense():
    mesh = make_mesh(n_data=1, n_model=8)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(64, 3)).astype(np.float32)
    y = rng.normal(size=(128, 3)).astype(np.float32)  # 128 divides by 8
    fn = sharded_nn_min(mesh)
    got = np.asarray(fn(jnp.array(x), jnp.array(y)))
    ref = ((x[:, None] - y[None]) ** 2).sum(-1).min(1)
    assert np.allclose(got, ref, atol=1e-5)


def test_initialize_distributed_single_process_noop(monkeypatch):
    from deformationpyramid_tpu.parallel import mesh as M

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert M.initialize_distributed() is False


def test_initialize_distributed_wires_coordinator(monkeypatch):
    import jax
    from deformationpyramid_tpu.parallel import mesh as M

    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert M.initialize_distributed() is True
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}


def test_two_process_dcn_allgather(tmp_path):
    """REAL multi-host runtime smoke (SURVEY.md §2.4 mesh/runtime row): two
    processes rendezvous at a localhost coordinator through
    ``initialize_distributed`` (env-var path, as a pod runtime would) and
    run a cross-process ``process_allgather`` — the communication pattern
    of the sharded eval sweep."""
    import socket
    import subprocess
    import sys

    child = tmp_path / "dcn_child.py"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child.write_text(f"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from deformationpyramid_tpu.parallel.mesh import initialize_distributed
assert initialize_distributed(), "expected multi-process init"
import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
assert jax.process_count() == 2
g = multihost_utils.process_allgather(jnp.float32(1 + jax.process_index()))
assert sorted(np.asarray(g).ravel().tolist()) == [1.0, 2.0], g
print("DCN_OK", jax.process_index())
""")
    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTEST_CURRENT_TEST", None)
        env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(child)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err[-2000:]
        assert "DCN_OK" in out, (out, err[-500:])
