"""Native (C++) host-preprocessing ops with transparent numpy fallback.

The compiled extension lives in ``cxx/`` (built via ``cd cxx && python
setup.py build_ext --inplace``). API mirrors ``data/collate``'s
grid_subsample / radius_search; when the .so is absent the pure-Python
implementations are used, so the framework works everywhere and speeds up
where the toolchain built it.
"""
from __future__ import annotations

import glob
import os
import sys

import numpy as np

_native = None
_cxx_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "cxx")
if os.path.isdir(_cxx_dir):
    candidates = glob.glob(os.path.join(_cxx_dir, "dp_native*.so")) + \
        glob.glob(os.path.join(_cxx_dir, "build", "lib*", "dp_native*.so"))
    if candidates:
        import importlib.util
        spec = importlib.util.spec_from_file_location("dp_native", candidates[0])
        _native = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(_native)
        except Exception:  # pragma: no cover - ABI mismatch etc.
            _native = None


def has_native() -> bool:
    return _native is not None


def grid_subsample(points: np.ndarray, dl: float):
    """Voxel-grid barycenter subsampling -> [M, 3] float32."""
    if _native is not None:
        return _native.grid_subsample(np.ascontiguousarray(points, np.float32),
                                      float(dl))
    from ..data.collate import grid_subsample as py_impl
    return py_impl(points, dl)[0]


def radius_neighbors(queries: np.ndarray, supports: np.ndarray,
                     radius: float, max_k: int) -> np.ndarray:
    """Distance-ordered fixed-radius NN, shadow index == len(supports)."""
    if _native is not None:
        return _native.radius_neighbors(
            np.ascontiguousarray(queries, np.float32),
            np.ascontiguousarray(supports, np.float32),
            float(radius), int(max_k))
    from ..data.collate import radius_search as py_impl
    return py_impl(queries, supports, radius, max_k)
