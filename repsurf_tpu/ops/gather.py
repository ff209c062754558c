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
    """points [B, N, C] float, flat_idx [B, Q] -> [B, Q, C] via MXU.

    The f32 values are split into three non-overlapping bf16 terms
    (v = v1 + v2 + v3 exactly: each residual cancellation is exact and the
    8+8+8 mantissa bits cover f32's 24) and contracted against the one-hot
    at the MXU's native bf16 rate with f32 accumulation.  Each output row
    receives exactly one non-zero product per term, so the gather is
    bit-exact — at ~2x the speed of a Precision.HIGHEST contraction, whose
    6-pass emulation this hand-rolled 3-pass split replaces.  The one-hot
    build itself (a [B, Q, N] compare, VPU-bound) is shared across the
    three terms by XLA CSE.
    """
    n = points.shape[1]
    col = jnp.arange(n, dtype=flat_idx.dtype)
    # this routine only runs on the TPU route (see index_points), where
    # bf16 operands hit the MXU's native rate; CPU falls back to take()
    onehot = (flat_idx[:, :, None] == col[None, None, :]).astype(jnp.bfloat16)
    if points.dtype != jnp.float32:
        # exactness for non-f32 floats (e.g. bf16 inputs) needs no split
        terms = [points]
    else:
        terms = _split_bf16_terms(points)
    # ONE matmul over the channel-concatenated terms, then summed slices:
    # the MXU pads output lanes to 128, so three C~13 matmuls each waste
    # ~90% of their tiles while 3C columns ride the same padded tile for
    # free (bit-identical — same contractions, separate accumulators)
    cat = terms[0] if len(terms) == 1 else jnp.concatenate(terms, axis=-1)
    g = jnp.einsum(
        "bqn,bnc->bqc", onehot, cat, preferred_element_type=jnp.float32
    )
    c = points.shape[-1]
    out = g[..., :c]
    for t in range(1, len(terms)):
        out = out + g[..., t * c : (t + 1) * c]
    return out.astype(points.dtype)


def _split_bf16_terms(x):
    """f32 -> three bf16 terms summing exactly to x.

    The split must truncate through explicit mantissa masking: the naive
    ``x - f32(bf16(x))`` is algebraically eliminated by XLA's simplifier
    (the bf16->f32 round-trip folds to x, zeroing the residual), which
    silently degrades the gather to plain bf16.  Masking the low 16
    mantissa bits keeps 7 explicit bits per term (8 with the implicit
    leading 1); 3 terms cover f32's 24.  Subnormal inputs (< 2^-126) are
    not split exactly — irrelevant for coordinates/features and flushed by
    the TPU regardless.
    """
    mask = jnp.uint32(0xFFFF0000)
    b1 = jax.lax.bitcast_convert_type(x, jnp.uint32) & mask
    v1 = jax.lax.bitcast_convert_type(b1, jnp.float32)
    r1 = x - v1
    b2 = jax.lax.bitcast_convert_type(r1, jnp.uint32) & mask
    v2 = jax.lax.bitcast_convert_type(b2, jnp.float32)
    v3 = r1 - v2
    return (
        v1.astype(jnp.bfloat16),
        v2.astype(jnp.bfloat16),
        v3.astype(jnp.bfloat16),
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


def index_points_multi(idx, *tensors):
    """Gather several channel tensors with ONE one-hot build.

    The [B, Q, N] one-hot compare is the VPU-bound cost of the MXU gather
    route; grouping stages gather 2-3 tensors with the same indices
    (center, normal, feature), so concatenating channels first amortizes
    it.  Returns the gathered tensors split back out, exactly equal to
    per-tensor index_points calls.

    Args:
      idx: [B, M] or [B, M, K] int indices.
      *tensors: [B, N, C_i] arrays (None entries pass through as None).

    Returns:
      tuple of gathered arrays ([B, M(, K), C_i] or None), same order.
    """
    live = [t for t in tensors if t is not None]
    if not live:
        return tensors
    if len(live) == 1:
        return tuple(
            index_points(t, idx) if t is not None else None for t in tensors
        )
    cat = jnp.concatenate(live, axis=-1)
    g = index_points(cat, idx)
    out, off = [], 0
    for t in tensors:
        if t is None:
            out.append(None)
        else:
            c = t.shape[-1]
            # concatenation promotes mixed dtypes (bf16 alongside f32); a
            # row-gather of a promoted value is exact, so casting back to
            # the input dtype restores per-tensor index_points equality
            out.append(g[..., off : off + c].astype(t.dtype))
            off += c
    return tuple(out)


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
