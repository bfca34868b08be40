"""Build script for the native host-IO extension.

    python setup.py build_ext --inplace

The framework falls back to the pure-numpy path when the extension isn't
built (sparseeventid_tpu/io/hostio.py).
"""

import numpy
from setuptools import Extension, setup

setup(
    name="sparseeventid_tpu",
    version="0.1.0",
    packages=["sparseeventid_tpu"],
    ext_modules=[
        Extension(
            "sparseeventid_tpu.io._hostio",
            sources=["sparseeventid_tpu/io/_hostio.cpp"],
            depends=["sparseeventid_tpu/io/_hostio_core.h"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            language="c++",
        )
    ],
)
