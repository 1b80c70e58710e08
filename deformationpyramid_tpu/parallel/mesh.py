"""Device-mesh runtime layer.

The reference is single-process/single-GPU (SURVEY.md §2.4: no NCCL/MPI
anywhere); this module is the TPU-native replacement: `jax.sharding.Mesh`
over ICI with a `data` axis for pair-parallel registration and a `model`
axis for intra-pair sharded chamfer on giant clouds.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices: list | None = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis — registration is
    embarrassingly parallel over pairs, so DP is the primary axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pair/batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
