"""Build the native preprocessing extension:

    cd cxx && python setup.py build_ext --inplace

The .so lands next to this file; ``deformationpyramid_tpu.native`` searches
here and falls back to numpy/scipy implementations when absent.
"""
import numpy as np
from setuptools import Extension, setup

setup(
    name="dp_native",
    ext_modules=[
        Extension(
            "dp_native",
            sources=["native_ops.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        )
    ],
)
