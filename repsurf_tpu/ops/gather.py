"""Point gathering / grouping.

Replaces the reference gather kernels (classification gathering / grouping
CUDA kernels, sampling_cuda_kernel.cu:6-36 and grouping_cuda_kernel.cu:60-74;
segmentation fancy indexing ``xyz[idx.view(-1).long()]``).

On TPU, XLA lowers ``take_along_axis`` to a scalar-unit gather loop (~6.5 ms
for a [64, 512x32, 16] grouping on v5e).  Recasting the gather as a one-hot
contraction keeps it on the MXU — XLA fuses the iota-compare into the dot
operand so the [Q, N] one-hot is never materialized — and with HIGHEST
precision the result is bit-exact (each output row receives exactly one
f32 value).  Same shape runs in ~0.2 ms: ~30x.

The scatter-add backward of the reference CUDA kernels comes for free from
JAX autodiff (the transpose of the contraction is another contraction).
"""

import jax
import jax.numpy as jnp

# max Q*N for the one-hot gather route (~64M one-hot elements per channel)
_ONEHOT_MAX_QN = 1 << 26


def _gather_onehot(points, flat_idx):
    """points [B, N, C] float, flat_idx [B, Q] -> [B, Q, C] via MXU."""
    n = points.shape[1]
    col = jnp.arange(n, dtype=flat_idx.dtype)
    onehot = (flat_idx[:, :, None] == col[None, None, :]).astype(points.dtype)
    return jnp.einsum(
        "bqn,bnc->bqc",
        onehot,
        points,
        preferred_element_type=points.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _gather_take(points, flat_idx):
    return jnp.take_along_axis(points, flat_idx[..., None], axis=1)


def index_points(points, idx):
    """Gather rows of a point tensor.

    Args:
      points: [B, N, C].
      idx: [B, M] (gathering) or [B, M, K] (grouping) int indices into N.

    Returns:
      [B, M, C] or [B, M, K, C].
    """
    if idx.ndim == 2:
        flat_idx, out_shape = idx, idx.shape + (points.shape[-1],)
    elif idx.ndim == 3:
        B, M, K = idx.shape
        flat_idx = idx.reshape(B, M * K)
        out_shape = (B, M, K, points.shape[-1])
    else:
        raise ValueError(f"idx must be rank 2 or 3, got {idx.ndim}")

    # The one-hot contraction costs O(Q*N) MACs — a bargain against the
    # scalar gather at classification scale, an explosion at scene scale
    # (Q=640k x N=80k would be ~50 G one-hot elements per channel).  Fall
    # back to the native gather above the threshold.
    use_mxu = (
        jax.default_backend() == "tpu"
        and jnp.issubdtype(points.dtype, jnp.floating)
        and flat_idx.shape[1] * points.shape[1] <= _ONEHOT_MAX_QN
    )
    flat = (
        _gather_onehot(points, flat_idx)
        if use_mxu
        else _gather_take(points, flat_idx)
    )
    return flat.reshape(out_shape)


def resort_points(points, order):
    """Permute the group axis of [B, N, G, C] by per-point order [B, N, G].

    Mirrors classification/modules/repsurface_utils.py:91-109 (and the
    segmentation twin at repsurface_utils.py:54-68).  Even over the tiny fan
    axis, TPU take_along_axis costs ~4 ms at classification scale — the GxG
    one-hot contraction is ~free.
    """
    if jax.default_backend() == "tpu" and jnp.issubdtype(
        points.dtype, jnp.floating
    ):
        g = points.shape[2]
        pos = jnp.arange(g, dtype=order.dtype)
        onehot = (order[..., None] == pos).astype(points.dtype)  # [B,N,G,G]
        return jnp.einsum(
            "bngh,bnhc->bngc",
            onehot,
            points,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.take_along_axis(points, order[..., None], axis=2)


def select_group(values, idx):
    """Pick one fan per point: values [B, N, G, C], idx [B, N] -> [B, N, C]
    (one-hot contraction; the repair step's gather)."""
    if jax.default_backend() == "tpu" and jnp.issubdtype(
        values.dtype, jnp.floating
    ):
        g = values.shape[2]
        pos = jnp.arange(g, dtype=idx.dtype)
        onehot = (idx[..., None] == pos).astype(values.dtype)  # [B,N,G]
        return jnp.einsum(
            "bng,bngc->bnc",
            onehot,
            values,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.take_along_axis(values, idx[..., None, None], axis=2)[:, :, 0]
