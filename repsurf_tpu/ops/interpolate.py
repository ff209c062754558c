"""k-NN inverse-distance feature interpolation (feature propagation).

Replaces the reference interpolation ops
(segmentation/modules/pointops/functions/pointops.py:256-270 — python-loop
gather-sum over 3 neighbors — and the CUDA interpolation kernels).  The
weights use Euclidean (sqrt) distances with the reference's 1e-8 epsilon.
"""

import functools

import jax
import jax.numpy as jnp

from .gather import index_points
from .neighbors import knn


def interpolate_weights(k, xyz_src, xyz_dst, valid_src=None):
    """kNN indices + inverse-distance weights for src -> dst interpolation.

    Args:
      k: static int (reference uses 3).
      xyz_src: [B, M, 3] coarse points (features live here).
      xyz_dst: [B, N, 3] fine points (interpolation targets).
      valid_src: optional [B] counts for the coarse cloud.

    Returns:
      idx: [B, N, k] indices into M; weight: [B, N, k] normalized weights.
    """
    idx, dist = knn(k, xyz_src, xyz_dst, valid=valid_src)
    recip = 1.0 / (dist + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return idx, weight


@functools.partial(jax.jit, static_argnames=("k",))
def three_interpolate(xyz_src, xyz_dst, feat_src, valid_src=None, k=3):
    """Inverse-distance weighted interpolation of features onto a finer cloud.

    Args:
      xyz_src: [B, M, 3]; xyz_dst: [B, N, 3]; feat_src: [B, M, C].
      valid_src: optional [B] counts for the coarse cloud.

    Returns:
      [B, N, C] interpolated features.
    """
    idx, weight = interpolate_weights(k, xyz_src, xyz_dst, valid_src)
    grouped = index_points(feat_src, idx)  # [B, N, k, C]
    return jnp.sum(grouped * weight[..., None], axis=2)
