"""Build the rtca_native C++ extension (streaming audio resampler).

    cd native && python setup.py build_ext --inplace

places rtca_native.*.so next to this file; the loader in
realtime_codec_agent_tpu/utils/native_audio.py finds it there (or anywhere on
sys.path). Pure CPython C API — no pybind11 required.
"""
from setuptools import Extension, setup

setup(
    name="rtca_native",
    version="0.1",
    ext_modules=[
        Extension(
            "rtca_native",
            sources=["rtca_audio.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-fvisibility=hidden"],
            language="c++",
        )
    ],
)
