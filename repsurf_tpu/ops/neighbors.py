"""Neighbor search (kNN / ball query) on TPU.

Replaces the reference CUDA kernels:
  * segmentation offset-kNN heap kernel
    (segmentation/modules/pointops/src/knnquery/knnquery_cuda_kernel.cu:65-108)
  * classification insertion-sort kNN
    (classification/modules/pointops/src/knnquery/knnquery_cuda_kernel.cu:6-50)
  * classification ball query
    (classification/modules/pointops/src/ballquery/ballquery_cuda_kernel.cu:47-80)

TPU formulation: the pairwise squared-distance matrix is computed in tiles as
``|q|^2 + |p|^2 - 2 q.p`` — the cross term is a [M, 3] x [3, N] matmul —
and the k smallest entries are found by **iterative extraction** (k unrolled
rounds of argmin + mask).  XLA fuses the rounds into the distance computation
so each tile is read once; on v5e this is ~130x faster than ``lax.top_k``
(which lowers to a full sort) and produces identical indices, including the
lowest-index tie-break.  Queries are processed in chunks so scene-scale
problems (80k x 80k) never materialize the full matrix.

Semantics preserved:
  * results sorted ascending by distance (the CUDA kernels heap-sort);
  * padding: queries in samples with fewer than k valid points receive the
    sample's first point (index 0) and the sentinel distance sqrt(1e10) for
    the missing slots — exactly the CUDA init ``best_idx[i] = start``,
    ``best_dist[i] = 1e10``;
  * kNN includes the query point itself when searching its own cloud
    (distance 0 comes first), as in the segmentation pipeline;
  * ball query keeps the first ``nsample`` in-radius points in index order
    and pads with the first hit (no hit => index 0).
"""

import functools

import jax
import jax.numpy as jnp

from .masking import BIG_DIST2, counts_to_mask

# Per-chunk query tile: bounds the [chunk, N] distance tile to ~256 MB at
# scene scale while keeping tiles large for small clouds.
_DEFAULT_CHUNK = 2048
_CHUNK_BYTES = 2**28
# clouds at least this large route to the bucket-grid kNN
_BUCKET_MIN_N = 16384


def _pairwise_dist2(q, p):
    """[M,3],[N,3] -> [M,N] squared distances (f32, clamped at 0)."""
    qq = jnp.sum(q * q, axis=-1)[:, None]
    pp = jnp.sum(p * p, axis=-1)[None, :]
    # full f32 accumulation: neighbor ordering is sensitive to the
    # cancellation in |q|^2+|p|^2-2qp, so don't let the MXU run this in bf16
    cross = jnp.dot(
        q,
        p.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(qq + pp - 2.0 * cross, 0.0)


def _extract_k_smallest(d2, k, col):
    """k rounds of (argmin, mask-with-inf): [M, N] -> ([M, k], [M, k]),
    ascending, lowest-index ties first.  k is static and unrolled; XLA fuses
    the rounds so the tile is materialized once."""
    idxs, ds = [], []
    for _ in range(k):
        i = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        d = jnp.min(d2, axis=-1)
        idxs.append(i)
        ds.append(d)
        d2 = jnp.where(col == i[:, None], jnp.inf, d2)
    return jnp.stack(idxs, axis=-1), jnp.stack(ds, axis=-1)


def _resolve_chunk(chunk, m, n):
    limit = max(256, _CHUNK_BYTES // (max(n, 1) * 4))
    return max(1, min(chunk, m, limit))


def knn(k, xyz, new_xyz, valid=None, new_valid=None, chunk=_DEFAULT_CHUNK, impl="auto"):
    """Batched masked k-nearest-neighbors.

    Dispatches to the VMEM-resident Pallas kernel on TPU (~2.7x the XLA
    extraction at scene scale, and exact self-distances) and the XLA
    formulation elsewhere.  Identical indices either way.

    Args:
      k: static int, neighbors per query.
      xyz: [B, N, 3] reference points.
      new_xyz: [B, M, 3] query points.
      valid: optional [B] count of real reference points.
      new_valid: optional [B] count of real queries (results for padded
        queries are well-defined but meaningless).
      chunk: query-chunk length for tiling (XLA path).

    Returns:
      idx: [B, M, k] int32 neighbor indices (ascending distance).
      dist: [B, M, k] float32 Euclidean distances (sqrt of squared distance;
        missing slots carry sqrt(1e10), mirroring the reference).
    """
    if impl == "auto":
        # Scene scale on TPU routes to the window-pruned kernel
        # (ops/pallas/knn_window.py): cell-sorted candidate runs DMA'd into
        # VMEM cut the scan's O(Q*N) work ~20x (measured at batch 2 on
        # synthetic rooms: k=9 self-80k 188 vs 263 ms, k=32 20k-q 72 vs
        # 198 ms, k=3 80k-q 36 ms).  The XLA bucket path (impl="bucket")
        # does the same pruning without Pallas but loses to BOTH on v5e —
        # XLA scatter/gather costs ~8 ns/row building its tables — and
        # remains for clouds beyond the scan kernels' VMEM budgets.
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and k <= 128 and _BUCKET_MIN_N <= xyz.shape[1] <= 500_000:
            impl = "window"
        elif on_tpu and k <= 256 and xyz.shape[1] <= 500_000:
            impl = "pallas"
        elif xyz.shape[1] > 500_000:
            impl = "bucket"
        else:
            impl = "xla"
    if impl == "window":
        from .pallas.knn_window import knn_window

        return knn_window(k, xyz, new_xyz, valid=valid)
    if impl == "bucket":
        from .bucket_knn import bucket_knn

        # the cell pitch adapts to measured point spacing inside bucket_knn;
        # here only size the static tables: candidate slots cover the
        # worst-case (volumetric) density at that pitch, and the grid budget
        # caps the [G^3, cand_max, 4] table at ~512 MB
        cand_max = -(-max(128, 16 * k) // 128) * 128
        g_cap = int((512 * 2**20 / (16 * cand_max)) ** (1 / 3))
        grid = max(16, min(48, g_cap))
        xyz = jax.lax.stop_gradient(xyz)
        new_xyz = jax.lax.stop_gradient(new_xyz)
        return bucket_knn(
            k, xyz, new_xyz, valid=valid, grid=grid, cand_max=cand_max
        )
    if impl == "pallas":
        from .pallas.knn import knn_pallas

        # the reference kNN is a torch autograd.Function with no backward
        # (constant idx/dist under autodiff); match that here — it also
        # keeps structurally-tainted center tangents out of the kernel's
        # unsupported JVP path.  The XLA twin stays differentiable.
        xyz = jax.lax.stop_gradient(xyz)
        new_xyz = jax.lax.stop_gradient(new_xyz)
        return knn_pallas(k, xyz, new_xyz, valid=valid)
    return knn_xla(k, xyz, new_xyz, valid=valid, new_valid=new_valid, chunk=chunk)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_xla(k, xyz, new_xyz, valid=None, new_valid=None, chunk=_DEFAULT_CHUNK):
    """XLA twin of the Pallas kNN kernel (CPU path / oracle)."""
    del new_valid  # padded queries compute garbage against valid points; fine
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    point_ok = None if valid is None else counts_to_mask(valid, N)
    chunk = _resolve_chunk(chunk, M, N)

    def per_sample(p, q, ok):
        col = jnp.arange(N, dtype=jnp.int32)[None, :]

        def one_chunk(qc):
            d2 = _pairwise_dist2(qc, p)  # [chunk, N]
            if ok is not None:
                d2 = jnp.where(ok[None, :], d2, BIG_DIST2)
            idxc, d2k = _extract_k_smallest(d2, k, col)
            # re-extracted / missing entries saturate at the sentinel
            d2k = jnp.minimum(d2k, BIG_DIST2)
            pad = d2k >= BIG_DIST2
            idxc = jnp.where(pad, 0, idxc)
            return idxc, jnp.sqrt(d2k)

        n_chunks = -(-M // chunk)
        pad_m = n_chunks * chunk - M
        qp = jnp.pad(q, ((0, pad_m), (0, 0)))
        qp = qp.reshape(n_chunks, chunk, 3)
        idxs, dists = jax.lax.map(one_chunk, qp)
        idxs = idxs.reshape(n_chunks * chunk, k)[:M]
        dists = dists.reshape(n_chunks * chunk, k)[:M]
        return idxs, dists

    if point_ok is None:
        point_ok = jnp.ones((B, N), dtype=bool)
    idx, dist = jax.vmap(per_sample)(xyz, new_xyz, point_ok)
    return idx, dist


def ball_group(radius, nsample, xyz, new_xyz, tensors, valid=None):
    """Fused ball query + grouping: gathered neighbors without indices.

    The separate ball_query pass materializes [B, M, nsample] indices that
    immediately feed one-hot gathers; but the gather's one-hot
    ``gidx[q,s] == n`` is exactly the ball query's own selection predicate
    ``within[q,n] & rank[q,n] == slot_target(s)`` — so building the
    selection tensor directly from the distance ranks makes the whole ball
    query pass vanish into the gather's (unavoidable, VPU-bound) one-hot
    build.  On v5e this halves the grouping cost of a classification SA
    stage.  Semantics are identical to
    ``index_points(t, ball_query(...))``: first ``nsample`` in-radius
    points in index order, short lists padded with the first hit, empty
    balls gather point 0.

    Args:
      radius: ball radius.
      nsample: static group size.
      xyz: [B, N, 3] reference points.
      new_xyz: [B, M, 3] query centers.
      tensors: sequence of [B, N, C_i] channel tensors (None passes
        through).
      valid: optional [B] count of real reference points.

    Returns:
      list of grouped [B, M, nsample, C_i] arrays (None where input None).
    """
    from .gather import _split_bf16_terms

    B, N, _ = xyz.shape
    c_total = sum(t.shape[-1] for t in tensors if t is not None)
    # the in-kernel Pallas twin (bit-identical) wins when the channel
    # count fills its capture-matmul lanes and the cloud fits VMEM
    # (measured v5e: C=141 4.7 -> 3.7 ms, C=13 3.3 -> 3.8 ms; see
    # ops/pallas/ball_group.py for the full numbers)
    if (
        jax.default_backend() == "tpu"
        and N <= 2048
        and c_total >= 43
        and all(
            t is None or jnp.issubdtype(t.dtype, jnp.floating)
            for t in tensors
        )
    ):
        from .pallas.ball_group import ball_group_pallas

        return ball_group_pallas(
            radius, nsample, xyz, new_xyz, tensors, valid=valid
        )
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    point_ok = (
        jnp.ones((B, N), dtype=bool) if valid is None else counts_to_mask(valid, N)
    )

    live = [t for t in tensors if t is not None]
    cat = jnp.concatenate(live, axis=-1) if len(live) > 1 else live[0]

    d2 = jax.vmap(_pairwise_dist2)(new_xyz, xyz)  # [B, M, N]
    within = ((d2 <= radius * radius) & point_ok[:, None, :]).astype(
        jnp.float32
    )
    # inclusive prefix count of hits as an MXU matmul against a triangular
    # mask: XLA's native cumsum lowering costs ~10x more on TPU, while the
    # 0/1 operands are exact in bf16 and the f32 accumulation is exact to
    # 2^24, so DEFAULT precision loses nothing
    n_col = jnp.arange(N, dtype=jnp.int32)
    tril = (n_col[:, None] <= n_col[None, :]).astype(jnp.float32)
    rank = jnp.einsum(
        "bmn,nk->bmk", within, tril, preferred_element_type=jnp.float32
    )
    count = rank[..., -1:]  # [B, M, 1] float hits per ball
    # fold the within mask into the rank (rank 0 never matches a target)
    rankw = jnp.where(within > 0, rank, 0.0)
    slots = jnp.arange(1, nsample + 1, dtype=jnp.float32)  # [S]
    # slot target: its own rank while hits remain, else rank 1 (pad with
    # the first hit); empty balls fixed up on the small output below
    target = jnp.where(slots[None, None] <= count, slots[None, None], 1.0)
    # bf16 operands hit the MXU's native rate on TPU; on CPU bf16 matmuls
    # are emulated scalar-by-scalar — use exact f32 there (no split needed)
    on_tpu = jax.default_backend() == "tpu"
    oh_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    onehot = (rankw[:, :, None, :] == target[..., None]).astype(oh_dtype)

    if on_tpu and cat.dtype == jnp.float32:
        terms = _split_bf16_terms(cat)
    else:
        terms = [cat]
    # one channel-concatenated matmul instead of one per split term: the
    # MXU pads output lanes to 128, so 3C columns cost the same tiles as C
    # (bit-identical — same contractions, separate accumulators)
    tcat = terms[0] if len(terms) == 1 else jnp.concatenate(terms, axis=-1)
    g = jnp.einsum(
        "bmsn,bnc->bmsc", onehot, tcat, preferred_element_type=jnp.float32
    )
    c_all = cat.shape[-1]
    out = g[..., :c_all]
    for t in range(1, len(terms)):
        out = out + g[..., t * c_all : (t + 1) * c_all]
    # empty balls gather point 0 (CUDA kernel's idx=0 degenerate case)
    out = jnp.where(
        (count == 0.0)[..., None], cat[:, None, 0:1, :].astype(out.dtype), out
    )
    out = out.astype(cat.dtype)

    res, off = [], 0
    for t in tensors:
        if t is None:
            res.append(None)
        else:
            c = t.shape[-1]
            res.append(out[..., off : off + c])
            off += c
    return res


@functools.partial(jax.jit, static_argnames=("nsample", "chunk"))
def ball_query(radius, nsample, xyz, new_xyz, valid=None, chunk=_DEFAULT_CHUNK):
    """Batched masked ball query (classification grouping op).

    For every query, returns the indices of the first ``nsample`` points (in
    index order) whose squared distance is <= radius^2; short lists are padded
    with the first in-radius index (or 0 if the ball is empty), matching
    classification/modules/pointnet2_utils.py:78-99 and the fast CUDA kernel.

    Args:
      radius: float ball radius.
      nsample: static int group size.
      xyz: [B, N, 3] reference points.
      new_xyz: [B, M, 3] query centers.
      valid: optional [B] count of real reference points.

    Returns:
      idx: [B, M, nsample] int32.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    point_ok = (
        jnp.ones((B, N), dtype=bool) if valid is None else counts_to_mask(valid, N)
    )
    chunk = _resolve_chunk(chunk, M, N)

    def per_sample(p, q, ok):
        col = jnp.arange(N, dtype=jnp.int32)[None, :]

        def one_chunk(qc):
            d2 = _pairwise_dist2(qc, p)  # [chunk, N]
            within = (d2 <= radius * radius) & ok[None, :]
            # single-pass selection: the r-th hit of a row is the unique n
            # with cumulative-hit-rank r, so one fused reduce over N fills
            # all nsample slots at once (~2.6x the k-round extraction)
            rank = jnp.cumsum(within.astype(jnp.int32), axis=-1)
            slots = jnp.arange(1, nsample + 1, dtype=jnp.int32)
            indic = (rank[:, :, None] == slots) & within[:, :, None]
            colf = col.astype(jnp.float32)
            sel = jnp.sum(
                jnp.where(indic, colf[:, :, None], 0.0), axis=1
            ).astype(jnp.int32)  # [chunk, nsample]
            count = rank[:, -1]
            have = jnp.arange(nsample, dtype=jnp.int32)[None, :] < jnp.minimum(
                count, nsample
            )[:, None]
            first = sel[:, :1]
            return jnp.where(have, sel, first)  # empty ball rows stay 0

        n_chunks = -(-M // chunk)
        pad_m = n_chunks * chunk - M
        qp = jnp.pad(q, ((0, pad_m), (0, 0)))
        qp = qp.reshape(n_chunks, chunk, 3)
        sels = jax.lax.map(one_chunk, qp)
        return sels.reshape(n_chunks * chunk, nsample)[:M]

    return jax.vmap(per_sample)(xyz, new_xyz, point_ok)
