"""Build the native host-postprocess extension:

    cd native && python setup.py build_ext --inplace

oar_ocr_tpu.native auto-builds on first import when the compiled module
is absent (falling back to the pure-Python path if compilation fails).
"""

from setuptools import Extension, setup

setup(
    name="oar_native",
    ext_modules=[
        Extension(
            "oar_native",
            sources=["db_candidates.cpp", "page_tiles.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
        )
    ],
)
