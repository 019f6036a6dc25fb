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
    _log_backend_version(cache_dir)


def _log_backend_version(cache_dir: str) -> None:
    """Append the backend's platform_version to backend_versions.log.

    Every cache key hashes backend.platform_version verbatim; the tunnel
    backend's version string carries a build timestamp + CL number, so a
    tunnel reconnect onto a differently-built server silently invalidates
    the WHOLE cache (round-4 observation: same-code gate runs hours apart
    recompiled every program; back-to-back runs hit). This log is the
    evidence trail — if entries differ only in build metadata while
    "SerializedExecutable/compile-cache/compat" tokens match, the fix is a
    scrubbed _hash_platform. Best-effort and deferred: the backend may not
    be initialized yet, so the write happens lazily on first use via an
    atexit hook (initializing it here would force backend startup)."""
    import atexit

    def write():
        try:
            import jax
            from jax._src import xla_bridge

            if not xla_bridge._backends:
                return  # backend never initialized; nothing to record
            b = jax.devices()[0].client
            line = f"{__import__('time').time():.0f} {b.platform} {b.platform_version!r}\n"
            with open(os.path.join(cache_dir, "backend_versions.log"), "a") as f:
                f.write(line)
        except Exception:
            pass

    atexit.register(write)
