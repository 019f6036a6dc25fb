"""Test environment: force an 8-device virtual CPU mesh so sharding logic is
exercised without TPU hardware (multi-chip paths compile + execute on the
virtual devices; real-chip benchmarking happens in bench.py).

NOTE: the environment ships with JAX_PLATFORMS=axon (a TPU tunnel) and
something re-prepends ``axon`` to jax_platforms even when the env var is
overwritten — so the platform must be forced via jax.config.update, before any
backend initialization.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# single-CPU host: persist compiled executables across test runs
from realtime_codec_agent_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()
