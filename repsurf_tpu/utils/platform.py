"""Backend selection that survives plugin overrides.

The axon TPU plugin rewrites ``JAX_PLATFORMS`` to "axon,cpu" during import,
so an operator's ``JAX_PLATFORMS=cpu`` silently lands on the TPU anyway.
Entry points call ``honor_platform_env()`` right after importing jax: if the
environment explicitly requested a platform, it is re-asserted through
jax.config (which the plugin cannot override)."""

import os


def honor_platform_env():
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    if jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)


def enable_compilation_cache(path=None):
    """Turn on JAX's persistent compilation cache.

    The production eval forward at [4, 80000] costs a ~10 min single-core
    XLA compile on this host; with the cache enabled only the FIRST process
    ever pays it.  Honors ``JAX_COMPILATION_CACHE_DIR`` if set; defaults to
    a /tmp directory shared across runs on this machine."""
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or "/tmp/repsurf_tpu_xla_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
