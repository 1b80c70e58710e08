"""Tests for support utilities: config (!join), timers, meters, checkpoints."""
import os
import time

import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.utils.checkpoint import load_meta, load_pytree, save_pytree
from deformationpyramid_tpu.utils.config import AttrDict, load_config
from deformationpyramid_tpu.utils.logging import AverageMeter, Logger
from deformationpyramid_tpu.utils.timers import Timers


def test_config_join_and_attr_access(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "a: &a 0.3\n"
        "nested: { x: 1, y: [ {z: 2} ] }\n"
        "exp_dir: !join [ thr, *a ]\n")
    cfg = load_config(str(p), overrides={"b": 7})
    assert cfg.a == 0.3
    assert cfg.nested.x == 1
    assert cfg.nested.y[0].z == 2
    assert cfg.exp_dir == "thr_0.3"
    assert cfg.b == 7
    assert cfg.get("missing", "d") == "d"


def test_timers_accumulate():
    t = Timers()
    for _ in range(3):
        t.tic("op")
        time.sleep(0.01)
        t.toc("op")
    assert t.timers["op"].count == 3
    assert t.timers["op"].avg >= 0.009
    assert any("op" in s for s in t.get_strings())


def test_average_meter_stats():
    m = AverageMeter()
    for v in [1.0, 2.0, 3.0]:
        m.update(v)
    assert m.avg == 2.0 and m.count == 3
    assert abs(m.std - np.std([1, 2, 3])) < 1e-9


def test_logger_appends(tmp_path):
    path = str(tmp_path / "log" / "x.log")
    lg = Logger(path)
    lg.write("hello\n")
    lg.close()
    lg2 = Logger(path)
    lg2.write("world\n")
    lg2.close()
    assert open(path).read() == "hello\nworld\n"


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "nested": {"b": jnp.ones((4,)), "flag": True, "name": "x"},
        "lst": [jnp.zeros((2,)), {"c": jnp.full((1,), 7.0)}],
    }
    path = str(tmp_path / "ck.npz")
    save_pytree(path, tree, meta={"epoch": 3})
    like = {
        "a": jnp.zeros((2, 3)),
        "nested": {"b": jnp.zeros((4,)), "flag": False, "name": ""},
        "lst": [jnp.ones((2,)), {"c": jnp.zeros((1,))}],
    }
    loaded = load_pytree(path, like)
    assert np.allclose(np.asarray(loaded["a"]), np.arange(6).reshape(2, 3))
    assert loaded["nested"]["flag"] is True
    assert loaded["nested"]["name"] == "x"
    assert float(loaded["lst"][1]["c"][0]) == 7.0
    assert load_meta(path)["epoch"] == 3


def test_checkpoint_shape_mismatch_raises(tmp_path):
    path = str(tmp_path / "ck.npz")
    save_pytree(path, {"w": jnp.zeros((2, 2))})
    try:
        load_pytree(path, {"w": jnp.zeros((3, 3))})
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend (production multi-host checkpointing, SURVEY §5)
    round-trips a param tree into the structure of a zeros-like template."""
    import jax
    import jax.numpy as jnp

    from deformationpyramid_tpu.utils.checkpoint import (
        load_pytree_orbax, save_pytree_orbax)

    tree = {"a": jnp.arange(6.0).reshape(2, 3),
            "b": {"w": jnp.full((4,), 2.0), "n": jnp.int32(7)}}
    p = str(tmp_path / "ck")
    save_pytree_orbax(p, tree)
    like = jax.tree.map(jnp.zeros_like, tree)
    out = load_pytree_orbax(p, like)
    assert np.allclose(out["a"], tree["a"])
    assert np.allclose(out["b"]["w"], 2.0)
    assert int(out["b"]["n"]) == 7
