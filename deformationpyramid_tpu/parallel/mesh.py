"""Device-mesh runtime layer.

The reference is single-process/single-GPU (SURVEY.md §2.4: no NCCL/MPI
anywhere); this module is the TPU-native replacement: `jax.sharding.Mesh`
over ICI with a `data` axis for pair-parallel registration and a `model`
axis for intra-pair sharded chamfer on giant clouds. For multi-host eval
sweeps across a DCN-connected slice, ``initialize_distributed`` wires
``jax.distributed.initialize`` so ``jax.devices()`` spans every host and
the same (data, model) mesh lays DP shards across hosts (collectives then
ride ICI within a slice and DCN across slices).
"""
from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host (DCN) runtime init (SURVEY.md §2.4 mesh/runtime row).

    Call once per process before any backend touch. Arguments default to
    the standard env vars (``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``); under a TPU pod runtime
    jax auto-detects all three. Returns True when a multi-process runtime
    was initialized, False for the single-process fallback (the common
    local case — also used when no coordinator is configured).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or (num_processes or 1) <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


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
