"""Pytree checkpointing (npz flat format + metadata).

Replaces the reference's ``torch.save`` snapshot flow
(``correspondence/lib/trainer.py:68-108``): save/load arbitrary JAX pytrees
with '/'-joined key paths, plus best-metric bookkeeping for training.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None or isinstance(tree, (str, bool, int, float)):
        out[prefix[:-1] + ".__scalar__"] = np.asarray(json.dumps(tree))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    flat = _flatten(tree)
    # record the container structure so load can rebuild lists vs dicts
    structure = jax.tree.structure(
        jax.tree.map(lambda _: 0, tree, is_leaf=lambda x: x is None))
    flat["__structure__"] = np.asarray(str(structure))
    if meta:
        flat["__meta__"] = np.asarray(json.dumps(meta))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_pytree(path: str, like: Any) -> Any:
    """Load into the structure of ``like`` (shapes validated)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files if not k.startswith("__")}

    def rebuild(tree: Any, prefix: str = ""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(rebuild(v, f"{prefix}{i}/")
                              for i, v in enumerate(tree))
        key = prefix[:-1]
        skey = key + ".__scalar__"
        if skey in flat:
            return json.loads(str(flat[skey]))
        arr = flat[key]
        if hasattr(tree, "shape") and tuple(arr.shape) != tuple(np.shape(tree)):
            raise ValueError(f"shape mismatch for {key}: "
                             f"{arr.shape} vs {np.shape(tree)}")
        return jax.numpy.asarray(arr)

    return rebuild(like)


def load_meta(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        if "__meta__" in z.files:
            return json.loads(str(z["__meta__"]))
    return {}


# ---------------------------------------------------------------------------
# Orbax backend — production checkpointing (async, sharding-aware)
# ---------------------------------------------------------------------------
# The npz format above is the dependency-light default; orbax adds the
# properties a multi-host deployment needs (SURVEY.md §5 checkpoint row):
# per-shard writes for sharded arrays (no host gather), atomic finalize, and
# a retention-managed step directory for long training runs.

def save_pytree_orbax(path: str, tree: Any) -> None:
    """Write ``tree`` as an orbax checkpoint directory at ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_pytree_orbax(path: str, like: Any) -> Any:
    """Restore an orbax checkpoint into the structure/shapes of ``like``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)
