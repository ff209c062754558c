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
    a per-user cache directory created mode 0700 (a world-shared /tmp path
    would let another local user plant serialized executables that later
    runs deserialize and run)."""
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
        cache_dir = os.path.join(base, "repsurf_tpu", "xla")
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    st = os.stat(cache_dir)
    if st.st_uid != os.getuid():
        raise PermissionError(
            f"compilation cache dir {cache_dir} is owned by uid {st.st_uid}, "
            f"not the current user ({os.getuid()}) — refusing to deserialize "
            "executables from a directory another user controls"
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
