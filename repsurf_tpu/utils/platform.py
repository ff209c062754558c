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
