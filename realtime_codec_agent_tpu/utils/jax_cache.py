"""Persistent XLA compilation cache setup.

The dev/test environment has a single host CPU, so every XLA compile is
single-threaded and expensive; caching compiled executables on disk makes
repeat runs (tests, scripts, benchmarks) start in seconds instead of minutes.
Safe on TPU too — the first bench run warms the cache for later rounds.
"""
import os


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "RTCA_JAX_CACHE_DIR", os.path.expanduser("~/.cache/rtca_jax_cache")
    )
    # CPU AOT executables encode host machine features; reusing them across
    # hosts makes XLA spew machine-mismatch warnings (and risks SIGILL), so
    # key the cache by host + intended platform.
    host = os.uname().nodename or "unknown"
    platform = os.environ.get("JAX_PLATFORMS", "default").replace(",", "-") or "default"
    cache_dir = os.path.join(cache_dir, f"{host}-{platform}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
