"""Seeding.

JAX is functionally seeded (explicit PRNG keys threaded through every
stochastic op), which replaces the reference's global-RNG seeding dance
(classification/util/utils.py:11-24, segmentation/util/utils.py:85-96).
This helper seeds the *host-side* NumPy/python RNGs used by the data
pipeline and hands back a root JAX key.
"""

import random

import jax
import numpy as np


def set_seed(seed):
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)


def worker_rng(seed, worker_id):
    """Per-worker NumPy RNG (the analog of worker_init_fn,
    segmentation/util/utils.py:99-105)."""
    return np.random.RandomState(seed + worker_id)
