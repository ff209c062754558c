"""Masking helpers for padded point batches.

The whole framework uses packed-front padding: a batch ``[B, N, C]`` carries a
per-sample count ``valid: [B]`` and rows ``[0, valid[b])`` are real points.
This module converts counts to boolean masks and provides the large-distance
sentinel used by the neighbor ops (mirrors the ``1e10`` init of the reference
CUDA kernels, e.g. segmentation knnquery_cuda_kernel.cu:89).
"""

import jax.numpy as jnp

# Sentinel squared distance for invalid / missing neighbors.  Matches the
# reference kernels' init value (best_dist[i] = 1e10).
BIG_DIST2 = 1e10


def counts_to_mask(valid, n):
    """[B] int counts -> [B, n] bool mask (True = real point)."""
    if valid is None:
        raise ValueError("valid must not be None")
    ar = jnp.arange(n, dtype=jnp.int32)
    return ar[None, :] < valid[:, None]


def full_counts(batch, n):
    """Counts vector for a fully-valid batch."""
    return jnp.full((batch,), n, dtype=jnp.int32)
