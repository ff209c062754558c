"""Device-side (jnp) classification augmentations + FPS preprocessing.

Mirrors classification/modules/ptaug_utils.py:22-62 (per-cloud random scale /
shift, executed on device inside the jitted step) and the ``sample``
preprocessing helper (classification/modules/pointnet2_utils.py:114-124)
that FPS-downsamples each batch before the model.
"""

import functools

import jax
import jax.numpy as jnp

from ..ops.gather import index_points
from ..ops.sampling import farthest_point_sample

SCANOBJECTNN_AUG = {"scale_factor": 0.5, "shift_factor": 0.3}


def scale_point_cloud(key, pts, scale_range=0.2):
    """Per-cloud anisotropic random scale: U(1-r, 1+r) per axis.

    pts: [B, N, 3] (channels-last; the reference scales [B, 3, N])."""
    scales = (
        jax.random.uniform(key, (pts.shape[0], 1, 3)) * 2.0 - 1.0
    ) * scale_range + 1.0
    return pts * scales


def shift_point_cloud(key, pts, shift_range=0.2):
    """Per-cloud random translation: U(-r, r) per axis."""
    shifts = (jax.random.uniform(key, (pts.shape[0], 1, 3)) * 2.0 - 1.0) * shift_range
    return pts + shifts


def transform_point_cloud(key, pts, aug_scale=False, aug_shift=False,
                          scale_factor=0.5, shift_factor=0.3):
    """Flag-driven train-time augmentation (off by default, matching the
    reference recipe)."""
    if aug_scale:
        key, sub = jax.random.split(key)
        pts = scale_point_cloud(sub, pts, scale_factor)
    if aug_shift:
        key, sub = jax.random.split(key)
        pts = shift_point_cloud(sub, pts, shift_factor)
    return pts


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps_sample(pts, npoint):
    """FPS-downsample a batch of clouds: [B, N, C] -> [B, npoint, C]
    (xyz in the leading 3 channels drives the sampling)."""
    if pts.shape[-1] == 3 and jax.default_backend() == "tpu":
        # coords-only clouds: the FPS kernel emits the sampled coordinates
        # itself (bit-equal to the gather), skipping the one-hot build
        from ..ops.pallas.fps import fps_pallas

        _, sampled = fps_pallas(pts, npoint, return_xyz=True)
        return sampled
    idx = farthest_point_sample(pts[..., :3], npoint)
    return index_points(pts, idx)
