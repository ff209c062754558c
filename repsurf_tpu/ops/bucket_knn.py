"""Spatial bucket-grid kNN — the scene-scale replacement for the O(Q*N) scan.

The exact kNN kernels (ops/neighbors.py, ops/pallas/knn.py) scan every point
for every query; at S3DIS scale (80k points, k <= 32 within ~0.2 m) that
scan is the dominant cost of a training step (~0.5 s per call).  This module
prunes each query's candidate set to its 27 neighboring grid cells —
typically 100-300 points instead of 80k — while staying *provably exact*:

  1. bin points on a static G^3 grid whose pitch adapts to the cloud's
     bounding box; stable-sort points by cell id; per-cell [start, end)
     runs via searchsorted (all static shapes);
  2. per query, lay the 27 neighbor cells' runs into a [Q, cand_max] slot
     table (slot -> run via a cumulative-length search), then sort each
     row's candidate indices ascending so the extraction's lowest-position
     tie-break equals the brute-force kernels' lowest-global-index rule;
  3. gather candidate coordinates, compute direct-difference distances,
     extract k by min + masked-min rounds (identical semantics to
     ops/pallas/knn.py: ascending, sentinel sqrt(1e10) + idx 0 padding);
  4. EXACTNESS GUARD: a 27-cell neighborhood provably contains all true
     neighbors iff the k-th distance <= the cell pitch.  Queries that fail
     the guard — or overflowed cand_max, or fell outside the grid — are
     re-solved against the full cloud (a gathered fixed-size batch), and if
     more than fallback_max queries need that, a lax.cond switches the
     whole call to the brute-force path.  No configuration returns wrong
     neighbors; bad configurations are merely slow.

Pure XLA orchestration (no new Pallas kernel): sorts, searchsorted, native
gathers, fused extraction.  Works identically on CPU (oracle tests) and
TPU.  Replaces the round-1 prototype whose per-query per-cell gathers lost
to the scan; the run-table + row-sort formulation gathers each candidate
once.

Reference hot path being replaced: the offset kNN heap kernel
segmentation/modules/pointops/src/knnquery/knnquery_cuda_kernel.cu:65-108.
"""

import functools

import jax
import jax.numpy as jnp

from .masking import BIG_DIST2, counts_to_mask

_INT_SENTINEL = jnp.int32(2**31 - 1)


def _extract_rounds(d2, cand_idx, k):
    """k rounds of (min, masked-min) over the candidate lanes.

    Returns ([Q, k] global idx, [Q, k] sqrt distances) with the knn
    padding semantics (missing slots: idx 0, dist sqrt(1e10)).
    """
    q, c = d2.shape
    slot = jnp.arange(c, dtype=jnp.int32)[None, :]
    idxs, ds = [], []
    for _ in range(k):
        m = jnp.min(d2, axis=1)
        s = jnp.min(jnp.where(d2 == m[:, None], slot, c), axis=1)
        take = slot == s[:, None]
        gi = jnp.sum(jnp.where(take, cand_idx, 0), axis=1)
        d = jnp.minimum(m, BIG_DIST2)
        pad = d >= BIG_DIST2
        idxs.append(jnp.where(pad, 0, gi))
        ds.append(jnp.sqrt(d))
        d2 = jnp.where(take, jnp.inf, d2)
    return jnp.stack(idxs, axis=-1).astype(jnp.int32), jnp.stack(ds, axis=-1)


def _sample_bucket_knn(k, xyz, q, n_valid, grid, cand_max, fallback_max):
    """Single-sample bucket kNN; returns (idx [M,k], dist [M,k])."""
    N = xyz.shape[0]
    M = q.shape[0]
    G = grid
    G3 = G * G * G

    point_ok = jnp.arange(N) < n_valid
    okf = point_ok[:, None]
    lo = jnp.min(jnp.where(okf, xyz, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(okf, xyz, -jnp.inf), axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
    ext = jnp.maximum(hi - lo, 1e-6)
    # Density-matched pitch from MEASURED point spacing: the guard needs
    # the k-th neighbor distance within ~one pitch.  Scene clouds are
    # surfaces, not volumes (a bbox-volume density estimate is off by
    # orders of magnitude there), so estimate the nearest-neighbor spacing
    # s directly from a 512-point subsample (one cheap [512, N] pass) and
    # use the planar k-ball radius s*sqrt(k/pi) with 1.5x safety — an
    # overestimate for volumetric data, which only costs extra candidates.
    # The G-cell budget caps resolution (pitch never below extent/G).
    n_samp = min(512, N)
    samp = xyz[:n_samp]
    sd2 = jnp.sum(jnp.square(samp[:, None, :] - xyz[None, :, :]), axis=-1)
    sd2 = jnp.where((sd2 > 0.0) & point_ok[None, :], sd2, jnp.inf)
    nnd = jnp.sqrt(jnp.min(sd2, axis=1))  # [n_samp]
    row_ok = jnp.arange(n_samp) < jnp.minimum(n_valid, n_samp)
    nnd = jnp.where(row_ok & jnp.isfinite(nnd), nnd, 0.0)
    v = jnp.maximum(jnp.sum(row_ok.astype(jnp.int32)), 1)
    # median of the valid entries (invalid sort to the front as zeros)
    s_med = jnp.sort(nnd)[n_samp - (v + 1) // 2]
    cs_density = 1.5 * s_med * jnp.sqrt(k / jnp.pi)
    cs = jnp.maximum(jnp.max(ext) / G, cs_density)  # uniform pitch

    def cell_of(p):
        return jnp.clip(jnp.floor((p - lo) / cs).astype(jnp.int32), 0, G - 1)

    pc = cell_of(xyz)
    pcid = (pc[:, 0] * G + pc[:, 1]) * G + pc[:, 2]
    pcid = jnp.where(point_ok, pcid, G3)  # padding sorts past every cell
    # per-cell counts/starts via bincount+cumsum (cheaper than a G^3-wide
    # searchsorted)
    counts = jnp.bincount(jnp.minimum(pcid, G3), length=G3 + 1)[:G3].astype(
        jnp.int32
    )
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )

    qc_raw = jnp.floor((q - lo) / cs).astype(jnp.int32)
    outside = jnp.any((qc_raw < 0) | (qc_raw >= G), axis=-1)
    qc = jnp.clip(qc_raw, 0, G - 1)
    qcid = (qc[:, 0] * G + qc[:, 1]) * G + qc[:, 2]

    # Per-CELL cumulative run lengths, built with constant rolls instead of
    # gathers: neighbor (dx,dy,dz) of cell c is c + dx*G^2 + dy*G + dz, so
    # counts[neighbor] is the counts vector rolled by a constant.
    cell_iota = jnp.arange(G3, dtype=jnp.int32)
    ccx = cell_iota // (G * G)
    ccy = (cell_iota // G) % G
    ccz = cell_iota % G
    offsets = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]
    run_lens = []
    for dx, dy, dz in offsets:
        shift = (dx * G + dy) * G + dz
        ok = (
            (ccx + dx >= 0) & (ccx + dx < G)
            & (ccy + dy >= 0) & (ccy + dy < G)
            & (ccz + dz >= 0) & (ccz + dz < G)
        )
        run_lens.append(jnp.where(ok, jnp.roll(counts, -shift), 0))
    cum_cells = jnp.cumsum(jnp.stack(run_lens, axis=1), axis=1)  # [G3, 27]
    total_cells = cum_cells[:, -1]

    # Build per-cell candidate tables by SCATTER: every point writes itself
    # into the table row of each cell it neighbors (27 entries per point,
    # ~2M scattered rows) — per-QUERY candidate gathers would be ~10x the
    # rows and dominate everything (XLA gathers/scatters cost ~constant per
    # row, almost regardless of width).  Table channels: (gidx, x, y, z)
    # with gidx stored as f32 (exact below 2^24) so one sort orders them.
    order = jnp.argsort(pcid, stable=True).astype(jnp.int32)
    sorted_cid = pcid[order]
    # rank of each sorted point within its own cell's run
    sorted_rank = jnp.arange(N, dtype=jnp.int32) - starts[
        jnp.minimum(sorted_cid, G3 - 1)
    ]
    sorted_xyz = xyz[order]
    updates = jnp.concatenate(
        [order.astype(jnp.float32)[:, None], sorted_xyz], axis=1
    )  # [N, 4] rows: (gidx, x, y, z)

    S = G3 * cand_max
    tbl = jnp.concatenate(
        [jnp.full((S, 1), jnp.inf, jnp.float32), jnp.zeros((S, 3), jnp.float32)],
        axis=1,
    )
    d_cid = jnp.minimum(sorted_cid, G3 - 1)
    scx = d_cid // (G * G)
    scy = (d_cid // G) % G
    scz = d_cid % G
    pt_valid = sorted_cid < G3
    for j, (dx, dy, dz) in enumerate(offsets):
        # target cell c = d - off_j (cells for which the point's cell d is
        # the j-th neighbor)
        tcx = scx - dx
        tcy = scy - dy
        tcz = scz - dz
        ok = (
            pt_valid
            & (tcx >= 0) & (tcx < G)
            & (tcy >= 0) & (tcy < G)
            & (tcz >= 0) & (tcz < G)
        )
        tcid = (tcx * G + tcy) * G + tcz
        base = (
            jnp.take(cum_cells[:, j - 1], tcid)
            if j > 0
            else jnp.zeros((N,), jnp.int32)
        )
        slot = base + sorted_rank
        ok = ok & (slot < cand_max)
        flat = jnp.where(ok, tcid * cand_max + slot, S)
        tbl = tbl.at[flat].set(updates, mode="drop")

    # sort every cell's list by global index once => per-query rows come
    # out pre-sorted and extraction ties break exactly like the brute-force
    # kernels (lowest index first)
    tbl = tbl.reshape(G3, cand_max, 4)
    tbl_gidx, tbl_x, tbl_y, tbl_z = jax.lax.sort(
        [tbl[..., 0], tbl[..., 1], tbl[..., 2], tbl[..., 3]],
        dimension=-1,
        num_keys=1,
    )

    # per-query: one wide row-gather per channel (M rows, fast path)
    row_g = tbl_gidx[qcid]  # [M, cand_max]
    row_x = tbl_x[qcid]
    row_y = tbl_y[qcid]
    row_z = tbl_z[qcid]
    live = jnp.isfinite(row_g)
    safe_idx = jnp.where(live, row_g, 0.0).astype(jnp.int32)
    d2 = (
        jnp.square(q[:, 0:1] - row_x)
        + jnp.square(q[:, 1:2] - row_y)
        + jnp.square(q[:, 2:3] - row_z)
    )
    d2 = jnp.where(live, d2, jnp.inf)
    overflow = jnp.take(total_cells, qcid) > cand_max

    idx, dist = _extract_rounds(d2, safe_idx, k)

    # exactness guard: the k-th neighbor ball must fit inside the 27-cell
    # box.  Along each axis the box extends cs beyond the query's own cell,
    # so the per-query bound is cs + min(t, cs - t) where t is the query's
    # offset inside its cell (between cs and 1.5*cs — measurably fewer
    # false fallbacks than the flat cs bound).  A small margin absorbs
    # floor() boundary rounding.  Also flag truncated candidate tables and
    # queries outside the grid.
    t_off = q - (lo + qc.astype(jnp.float32) * cs)
    slack = jnp.min(jnp.minimum(t_off, cs - t_off), axis=-1)
    bound = cs + jnp.maximum(slack, 0.0)
    kth = dist[:, -1]
    bad = (kth > bound * 0.999) | overflow | outside

    def brute(queries):
        """Chunked full-cloud exact kNN for a fixed-size query set."""
        CH = 512
        m = queries.shape[0]
        m_pad = -(-m // CH) * CH
        qp = jnp.pad(queries, ((0, m_pad - m), (0, 0))).reshape(
            m_pad // CH, CH, 3
        )

        def one(qc_):
            d2_ = jnp.sum(jnp.square(qc_[:, None, :] - xyz[None, :, :]), axis=-1)
            d2_ = jnp.where(point_ok[None, :], d2_, BIG_DIST2)
            return _extract_rounds(
                d2_,
                jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], d2_.shape),
                k,
            )

        fi, fd = jax.lax.map(one, qp)
        return fi.reshape(m_pad, k)[:m], fd.reshape(m_pad, k)[:m]

    # tiered exact re-solve for flagged queries: lax.switch picks the
    # smallest sufficient batch so a handful of boundary queries costs a
    # few ms, not a full fallback_max brute pass; tier 0 (no bad queries)
    # pays nothing and the final tier redoes everything exactly (grossly
    # mis-sized grid)
    n_bad = jnp.sum(bad.astype(jnp.int32))
    tiers = sorted({min(256, fallback_max), min(2048, fallback_max), fallback_max})

    def make_resolver(size):
        def resolve(args):
            idx, dist = args
            bad_pos = jnp.nonzero(bad, size=size, fill_value=M)[0]
            fb_idx, fb_dist = brute(q[jnp.clip(bad_pos, 0, M - 1)])
            idx = idx.at[bad_pos].set(fb_idx, mode="drop")
            dist = dist.at[bad_pos].set(fb_dist, mode="drop")
            return idx, dist

        return resolve

    branches = [lambda a: a]
    branches += [make_resolver(s) for s in tiers]
    branches.append(lambda a: brute(q))
    sel = jnp.searchsorted(
        jnp.asarray([1] + [t + 1 for t in tiers]), n_bad, side="right"
    )
    return jax.lax.switch(sel, branches, (idx, dist))


@functools.partial(
    jax.jit, static_argnames=("k", "grid", "cand_max", "fallback_max")
)
def bucket_knn(
    k, xyz, new_xyz, valid=None, grid=32, cand_max=None, fallback_max=8192
):
    """Exact batched kNN via spatial bucketing.

    Drop-in equivalent of ops.neighbors.knn (same idx/dist semantics,
    including ascending order, lowest-index ties and the idx-0 /
    sqrt(1e10) padding) at a fraction of the work for large N.

    Args:
      k: static neighbor count.
      xyz: [B, N, 3] reference points; new_xyz: [B, M, 3] queries.
      valid: optional [B] int32 counts.
      grid: static cells per axis (uniform pitch = bbox_max_extent/grid).
      cand_max: static candidate-table width (default: >= 8k rounded to a
        lane multiple).
      fallback_max: static size of the exact re-solve batch for queries
        that fail the exactness guard.

    Returns:
      (idx [B, M, k] int32, dist [B, M, k] float32).
    """
    B, N, _ = xyz.shape
    if cand_max is None:
        cand_max = max(128, -(-8 * k // 128) * 128)
    if valid is None:
        valid = jnp.full((B,), N, jnp.int32)
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    # lax.map over the batch instead of vmap or a Python unroll: vmap would
    # batch the guarded lax.switch into a select that ALWAYS executes the
    # brute-force branch, while unrolling duplicates this (large) per-sample
    # graph B times — lax.map traces it once and keeps the switch a real
    # branch per sample.
    valid = valid.astype(jnp.int32)
    fb = min(fallback_max, new_xyz.shape[1])

    def one_sample(args):
        x_b, q_b, v_b = args
        return _sample_bucket_knn(
            k, x_b, q_b, v_b,
            grid=grid, cand_max=cand_max, fallback_max=fb,
        )

    return jax.lax.map(one_sample, (xyz, new_xyz, valid))
