"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the capability the
reference lacked — SURVEY.md §4)."""

import os

# Force, don't setdefault: the machine environment pins JAX_PLATFORMS=axon
# (remote TPU tunnel) and tests must run on the 8-virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: full-model CPU compiles take minutes on this
# host; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon plugin rewrites jax_platforms to "axon,cpu" during import,
# overriding the env var — force the config after import as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True, scope="module")
def _drop_executables_between_modules():
    """Release compiled executables after each test module.

    The full suite compiles ~190 jitted programs for 8 virtual devices; with
    all of them held live by jit caches, XLA's CPU backend deterministically
    SEGFAULTED inside backend_compile_and_load (LLVM JIT code loading) at the
    ~182nd test in three consecutive full-suite runs — while any ~100-test
    subset, including the exact crash-point test with its exact prefix file,
    passed.  Dropping cache references between modules keeps resident JIT
    code bounded; within-module reuse (the expensive per-file model compiles)
    is unaffected, and cross-module re-jits of shared library functions cost
    seconds each.
    """
    yield
    jax.clear_caches()
