"""deformationpyramid_tpu — TPU-native Neural Deformation Pyramid framework.

A ground-up JAX/XLA/Pallas re-design of rabbityl/DeformationPyramid
(Neural Deformation Pyramid, arXiv 2205.12796): per-pair test-time-optimized
non-rigid point-cloud registration, compiled end-to-end on TPU and batched
across device meshes.

Layers (bottom-up, mirroring SURVEY.md §7):
  geometry/  rotation & rigid-motion parameterizations (pure jnp)
  ops/       Pallas kernels + XLA ops (streaming 1-NN, chamfer)
  losses/    chamfer / arap / landmark / regularizers
  metrics/   scene-flow evaluation metrics with psum-able sums
  models/    NDP pyramid (stacked level params), baselines
  solve/     compiled registration engine (while_loop Adam + level scan)
  parallel/  mesh setup, pair-parallel sharding, sharded chamfer
  data/      4DMatch npz reader, PLY I/O, synthetic pairs
  utils/     config, timers, logging
"""

from .models.pyramid import NDPConfig, init_pyramid_params, warp, level_warp
from .solve.registration import SolverConfig, register_pair, register_batch, make_register_fn
from .ops.chamfer import truncated_chamfer, batched_truncated_chamfer
from .ops.knn import nn_argmin
from .metrics.flow import scene_flow_metrics, compute_flow_metrics

__version__ = "0.1.0"

__all__ = [
    "NDPConfig", "SolverConfig", "init_pyramid_params", "warp", "level_warp",
    "register_pair", "register_batch", "make_register_fn",
    "truncated_chamfer", "batched_truncated_chamfer", "nn_argmin",
    "scene_flow_metrics", "compute_flow_metrics",
]
