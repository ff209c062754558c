"""Furthest-point sampling (FPS) on TPU.

Replaces the reference CUDA kernels
(classification/modules/pointops/src/sampling/sampling_cuda_kernel.cu:58-168
and segmentation/modules/pointops/src/sampling/sampling_cuda_kernel.cu:14-129)
with a batched ``lax.fori_loop`` formulation: the per-point running
min-distance vector stays live across iterations (XLA keeps it on-chip), and
every iteration does one fused [B, N] distance + min + argmax sweep on the VPU.

Semantics preserved from the reference:
  * deterministic seed at the first point of every sample (CUDA kernels start
    at index 0 of each batch element / offset segment);
  * running min-distance update ``tmp = min(tmp, d2)`` including already
    selected points (their distance is 0, so they are never re-picked);
  * argmax tie-break = lowest index.

Padding semantics (new, for the fixed-shape batch layout): rows at or beyond
``valid[b]`` can never be selected (their candidate distance is forced to -1,
below the CUDA kernel's ``best = -1`` init).  When asked for more samples than
a sample has valid points, the extra slots repeat previously selected points
(FPS of a fully-covered set selects the point with running distance 0, i.e.
an arbitrary already-picked point) — callers mask them out via the returned
counts ``m_valid = min(npoint, valid)``.
"""

import functools

import jax
import jax.numpy as jnp

from .masking import counts_to_mask


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_xla(xyz, npoint, valid=None):
    """Batched masked FPS — pure-XLA formulation (CPU path / oracle twin of
    the Pallas kernel, mirroring the reference's cuda=False fallbacks).

    Args:
      xyz: [B, N, 3] float coordinates (padding rows arbitrary).
      npoint: static int, number of samples per batch element.
      valid: optional [B] int32 count of real points (default: all N valid).

    Returns:
      idx: [B, npoint] int32 selected indices into N.
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if valid is None:
        point_ok = jnp.ones((B, N), dtype=bool)
    else:
        point_ok = counts_to_mask(valid, N)

    def body(i, state):
        tmp, farthest, idx = state
        idx = idx.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # [B,1,3]
        d2 = jnp.sum(jnp.square(xyz - centroid), axis=-1)  # [B, N]
        tmp = jnp.minimum(tmp, d2)
        cand = jnp.where(point_ok, tmp, -1.0)
        farthest = jnp.argmax(cand, axis=-1).astype(jnp.int32)
        return tmp, farthest, idx

    tmp0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    idx0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    seed = jnp.zeros((B,), dtype=jnp.int32)
    _, _, idx = jax.lax.fori_loop(0, npoint, body, (tmp0, seed, idx0))
    return idx


def farthest_point_sample(xyz, npoint, valid=None, impl="auto"):
    """Batched masked FPS; dispatches to the Pallas VMEM-resident kernel on
    TPU (~126x the XLA loop; see ops/pallas/fps.py) and the XLA loop
    elsewhere.  Both produce identical indices.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from .pallas.fps import fps_pallas

        return fps_pallas(xyz, npoint, valid=valid)
    return farthest_point_sample_xla(xyz, npoint, valid=valid)
