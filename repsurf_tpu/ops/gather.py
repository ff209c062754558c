"""Point gathering / grouping.

Replaces the reference gather kernels (classification gathering / grouping
CUDA kernels, sampling_cuda_kernel.cu:6-36 and grouping_cuda_kernel.cu:60-74;
segmentation fancy indexing ``xyz[idx.view(-1).long()]``) with
``jnp.take_along_axis``, which XLA lowers to a TPU gather.  The scatter-add
backward of the CUDA version comes for free from JAX autodiff.
"""

import jax.numpy as jnp


def index_points(points, idx):
    """Gather rows of a point tensor.

    Args:
      points: [B, N, C].
      idx: [B, M] (gathering) or [B, M, K] (grouping) int indices into N.

    Returns:
      [B, M, C] or [B, M, K, C].
    """
    if idx.ndim == 2:
        return jnp.take_along_axis(points, idx[..., None], axis=1)
    if idx.ndim == 3:
        B, M, K = idx.shape
        flat = jnp.take_along_axis(points, idx.reshape(B, M * K, 1), axis=1)
        return flat.reshape(B, M, K, points.shape[-1])
    raise ValueError(f"idx must be rank 2 or 3, got {idx.ndim}")


def resort_points(points, order):
    """Permute the group axis of [B, N, G, C] by per-point order [B, N, G].

    Mirrors classification/modules/repsurface_utils.py:91-109 (and the
    segmentation twin at repsurface_utils.py:54-68).
    """
    return jnp.take_along_axis(points, order[..., None], axis=2)
