"""Window-pruned Pallas kNN: cell-sorted candidate runs DMA'd into VMEM.

The VMEM-resident scan (ops/pallas/knn.py) is compute-bound at scene scale:
every query still touches all N points (~2 VPU passes per extraction round,
near the formulation's floor).  The XLA bucket path (ops/bucket_knn.py)
prunes the arithmetic ~30x but drowns in scatter/gather row costs.  This
kernel keeps the pruning and kills the gathers:

  * points are sorted by 3-D grid cell (z fastest) on the XLA side, so one
    (x, y) column's z-window is a CONTIGUOUS run of the sorted array;
  * queries are sorted by cell and PADDED so no query block ever spans two
    (x, y) columns — a block's candidates are then exactly 9 runs (its
    column's 3x3 xy-neighborhood, each cut to the block's z-range +-1),
    fetched with plain async DMAs into a compact packed window (source
    starts rounded down to the 128-lane DMA alignment and masked; packed
    destinations 128-aligned);
  * per block the kernel computes [QBLK, W] direct-difference distances
    and extracts k by min + masked-min rounds over W ~ 2-3k candidate
    lanes instead of N;
  * ties break on the LOWEST GLOBAL INDEX (the candidate's original index
    rides along as an f32 lane, exact below 2^24), matching the brute
    kernels bit-for-bit;
  * EXACTNESS GUARD on the XLA side: the 3x3-column z-window provably
    contains all true neighbors iff the k-th distance is within one cell
    pitch on every axis; queries outside the point bbox clamp into the
    edge cells and tighten the bound by their overhang (margin), so only
    genuinely-uncoverable queries — kth beyond (pitch - margin), or
    blocks whose runs were truncated or overflowed the packed window —
    are re-solved against the full cloud with a tiered fallback whose
    chunk width matches the tier (a 32-query tier costs a 32-row scan,
    not a padded 512).  Wrong configurations are slow, never wrong.

Why 3-D cells: 2-D slab variants fail structurally on rooms — an
axis-perpendicular wall lives in ONE slab and overflows any per-slab
budget (measured: 9k-point runs), while 3-D cells bound every run by
surface-patch occupancy.

Replaces the reference's offset kNN heap kernel
(segmentation/modules/pointops/src/knnquery/knnquery_cuda_kernel.cu:65-108)
as the scene-scale fast path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..masking import BIG_DIST2

_GIDX_BIG = 3e7  # > any real index (python float: jnp scalars would be
# captured as pallas consts)
_NRUNS = 9
_RUN_PAD = 1152  # static per-run DMA size: run cap 1024 + 128 for alignment
# (corner columns of a room — two walls + floor + ceiling — reach ~900 points)
_RUN_CAP = _RUN_PAD - 128


def _window_kernel(
    k, w_lanes,
    tab_sref, p4_ref, q_ref, idx_ref, dist_ref, cand_ref, sems,
):
    """Window-kNN block with double-buffered candidate prefetch.

    tab_sref: SMEM run-table rows for my 8-block group PLUS the next
    group's first 8 (so block m can always read block m+1's row), per
    (block, run): [src, dst, len].  A per-group operand, NOT a whole-array
    scalar prefetch: the flat table is B * nblk * 27 int32 and outgrows
    the ~1 MB SMEM budget at scene scale beyond B~2.

    used_sref: this sample's count of blocks that hold real queries.  The
    reserved query padding (every occupied column may waste < qblk slots,
    bounded statically) leaves a long tail of reserved-but-unused blocks
    (~35% at 80k/qblk=64); inactive blocks skip the entire body.

    Pipelining: each candidate window needs 9 run-DMAs whose packed
    destinations overlap (fixed _RUN_PAD copy length vs round_up packing),
    so the copies must complete in issue order — enforced by chaining
    wait(j-1) before start(j).  Serial chains cost ~tens of us per block,
    so block m issues block m+1's chain into the OTHER half of the
    double-buffered window, one link per extraction round: the chain's
    serialization hides behind compute instead of blocking it.  Blocks run
    sequentially on the core, so buffer m%2 is never written while read.
    The final copy of a chain (run 8) is waited by the CONSUMING block;
    links 0..7 are waited by the issuing block's interleave.
    """
    b = pl.program_id(0)
    m = pl.program_id(1)
    row = jax.lax.rem(m, 8)
    buf = jax.lax.rem(m, 2)
    nbuf = jax.lax.rem(m + 1, 2)
    wp = w_lanes + _RUN_PAD  # per-buffer lane stride (multiple of 128)
    used = tab_sref[0, 0, 0, _NRUNS * 3]  # same value in every row
    prefetch_ok = (m + 1) < used

    def run_info(r, j):
        src = tab_sref[0, 0, r, j * 3 + 0]
        dst = tab_sref[0, 0, r, j * 3 + 1]
        ln = tab_sref[0, 0, r, j * 3 + 2]
        aligned = pl.multiple_of((src // 128) * 128, 128)
        return aligned, src - aligned, pl.multiple_of(dst, 128), ln

    def copy_for(r, bufi, j):
        a, _, d, _ = run_info(r, j)
        base = pl.multiple_of(bufi * wp, 128)
        return pltpu.make_async_copy(
            p4_ref.at[b, :, pl.ds(a, _RUN_PAD)],
            cand_ref.at[:, pl.ds(base + d, _RUN_PAD)],
            sems.at[bufi, j],
        )

    def prefetch_link(j):
        """Issue link j of block m+1's chain (waiting link j-1 first)."""

        @pl.when(prefetch_ok)
        def _():
            if j > 0:
                copy_for(row + 1, nbuf, j - 1).wait()
            copy_for(row + 1, nbuf, j).start()

    @pl.when(m < used)
    def _active_body():
        @pl.when(m == 0)
        def _cold_start():
            # each sample's first block has no predecessor: full own chain
            copy_for(row, buf, 0).start()
            for j in range(1, _NRUNS):
                copy_for(row, buf, j - 1).wait()
                copy_for(row, buf, j).start()

        qx = q_ref[0, :, 0:1]
        qy = q_ref[0, :, 1:2]
        qz = q_ref[0, :, 2:3]

        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, w_lanes), 1)
        valid_w = jnp.zeros((1, w_lanes), bool)
        for j in range(_NRUNS):
            _, delta, d, ln = run_info(row, j)
            local = lane_w - d
            valid_w = valid_w | ((local >= delta) & (local < delta + ln))

        copy_for(row, buf, _NRUNS - 1).wait()

        base = pl.multiple_of(buf * wp, 128)
        px = cand_ref[0:1, pl.ds(base, w_lanes)]
        py = cand_ref[1:2, pl.ds(base, w_lanes)]
        pz = cand_ref[2:3, pl.ds(base, w_lanes)]
        pg = cand_ref[3:4, pl.ds(base, w_lanes)]  # orig index f32 (< 2^24)

        d2 = jnp.square(qx - px) + jnp.square(qy - py) + jnp.square(qz - pz)
        d2 = jnp.where(valid_w, d2, BIG_DIST2)

        rows, _ = d2.shape
        k_pad = idx_ref.shape[2]
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (rows, k_pad), 1)
        acc_i = jnp.zeros((rows, k_pad), jnp.int32)
        acc_d = jnp.zeros((rows, k_pad), jnp.float32)
        for r in range(k):
            if r < _NRUNS:
                prefetch_link(r)
            mn = jnp.min(d2, axis=1)
            # tie-break on the smallest ORIGINAL index among equal
            # distances — window lane order is cell order, not index order
            gi = jnp.min(
                jnp.where(d2 == mn[:, None], pg, _GIDX_BIG), axis=1
            )
            sel = (d2 == mn[:, None]) & (pg == gi[:, None])
            d = jnp.minimum(mn, BIG_DIST2)
            pad = d >= BIG_DIST2
            i_out = jnp.where(pad, 0.0, gi).astype(jnp.int32)
            slot = lane_k == r
            acc_i = jnp.where(slot, i_out[:, None], acc_i)
            acc_d = jnp.where(slot, jnp.sqrt(d)[:, None], acc_d)
            d2 = jnp.where(sel, jnp.inf, d2)
        # chains longer than the round count (k < 9) finish here, still
        # overlapping the packing/output phase
        for j in range(min(k, _NRUNS), _NRUNS):
            prefetch_link(j)
        idx_ref[0] = acc_i
        dist_ref[0] = acc_d


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "grid2d", "grid_z", "qblk", "w_budget", "fallback_max",
        "interpret", "debug_counts",
    ),
)
def knn_window(
    k,
    xyz,
    new_xyz,
    valid=None,
    grid2d=None,
    grid_z=None,
    qblk=None,
    w_budget=4096,
    fallback_max=8192,
    interpret=False,
    debug_counts=False,
):
    """Exact batched kNN via the window-pruned Pallas kernel.

    Same semantics as ops.neighbors.knn (ascending distances, lowest-index
    ties, idx-0 / sqrt(1e10) padding).

    Args:
      k: static neighbor count.
      xyz: [B, N, 3]; new_xyz: [B, M, 3]; valid: optional [B] counts.
      grid2d: static cells per x/y axis; grid_z: static z cells.  The
        None default derives both from (N, k): the exactness guard fires
        whenever the k-th neighbor lies further than one cell, so the
        grid must be coarse enough that a 3x3-column window at average
        density holds ~32x k candidates.  A fixed fine grid (the old
        32/12 default) made the FPS-DOWNSAMPLED SA stages re-solve
        essentially every query brute-force: at stage density the k=32
        radius exceeds the cell size (measured ~150 ms of guarded
        fallback per seg train step, batch 2 x 80k — the single largest
        line in the round-3 step trace).
      qblk: static queries per kernel block (blocks never span (x, y)
        columns; None = auto from query density per column).
      w_budget: static packed candidate window width (lane multiple).
      fallback_max: static exact re-solve budget for guard failures.
    """
    from ..bucket_knn import _extract_rounds

    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    if grid2d is None:
        grid2d = max(4, min(32, int((9 * N / (32 * k)) ** 0.5)))
    if grid_z is None:
        # keep the room-shaped 32:12 xy:z aspect of the tuned default
        grid_z = max(2, int(round(grid2d * 12 / 32)))
    G = grid2d
    Gz = grid_z
    G2 = G * G
    if qblk is None:
        qblk = 64 if M >= 48 * G2 else 32
    if valid is None:
        valid = jnp.full((B,), N, jnp.int32)
    xyz = jax.lax.stop_gradient(xyz.astype(jnp.float32))
    new_xyz = jax.lax.stop_gradient(new_xyz.astype(jnp.float32))
    valid = valid.astype(jnp.int32)

    n_pad = _round_up(N, 128) + _RUN_PAD  # DMA windows may overhang
    # column padding bound: every occupied column wastes < qblk slots
    m_pad = _round_up(M + qblk * min(G2, M), qblk)
    nblk = m_pad // qblk
    k_pad = _round_up(k, 128)
    w_lanes = w_budget

    def prep(x, q, nv):
        point_ok = jnp.arange(N) < nv
        okf = point_ok[:, None]
        lo = jnp.min(jnp.where(okf, x, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(okf, x, -jnp.inf), axis=0)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
        ext = jnp.maximum(hi - lo, 1e-6)
        cs = ext / jnp.asarray([G, G, Gz], jnp.float32)
        cmax = jnp.asarray([G - 1, G - 1, Gz - 1])

        pc = jnp.clip(jnp.floor((x - lo) / cs).astype(jnp.int32), 0, cmax)
        pcid = (pc[:, 0] * G + pc[:, 1]) * Gz + pc[:, 2]
        pcid = jnp.where(point_ok, pcid, G2 * Gz)
        order = jnp.argsort(pcid, stable=True).astype(jnp.int32)
        counts = jnp.bincount(
            jnp.minimum(pcid, G2 * Gz), length=G2 * Gz + 1
        )[: G2 * Gz]
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
        )
        p4 = jnp.concatenate(
            [x[order], order.astype(jnp.float32)[:, None]], axis=1
        ).T
        p4 = jnp.pad(p4, ((0, 0), (0, n_pad - N)))

        qc_raw = jnp.floor((q - lo) / cs).astype(jnp.int32)
        # Queries outside the point bbox clamp into the edge cells; their
        # 3x3 window then covers everything within (pitch - margin) of the
        # query, so the exactness bound tightens by the per-query overhang
        # instead of a binary outside->fallback flag.  This matters even
        # for self-kNN: the bbox-max point floors into cell index G and
        # the old test flagged it "outside" (a handful of ~31 ms
        # tier-fallbacks per train step for boundary artifacts).
        margin = jnp.maximum(
            jnp.max(jnp.maximum(lo[None, :] - q, q - hi[None, :]), axis=-1),
            0.0,
        )
        qc = jnp.clip(qc_raw, 0, cmax)
        qcol = qc[:, 0] * G + qc[:, 1]
        qcid = qcol * Gz + qc[:, 2]
        qord = jnp.argsort(qcid, stable=True).astype(jnp.int32)
        s_col = qcol[qord]
        s_qz = qc[:, 2][qord]

        # padded positions: every column starts at a fresh qblk boundary,
        # so no block spans two columns
        col_counts = jnp.bincount(s_col, length=G2).astype(jnp.int32)
        col_blocks = -(-col_counts // qblk)
        col_pad_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(col_blocks * qblk).astype(jnp.int32)]
        )
        col_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(col_counts).astype(jnp.int32)]
        )
        rank = jnp.arange(M, dtype=jnp.int32) - col_start[s_col]
        pos = col_pad_start[s_col] + rank  # padded slot of sorted query i

        # owning column per block (forward-filled over multi-block columns
        # and trailing padding blocks)
        occ = col_counts > 0
        blk_seed = jnp.full((nblk,), -1, jnp.int32)
        blk_seed = blk_seed.at[
            jnp.where(occ, col_pad_start[:-1] // qblk, nblk)
        ].max(
            jnp.where(occ, jnp.arange(G2, dtype=jnp.int32), -1), mode="drop"
        )
        blk_col = jnp.maximum(
            jax.lax.associative_scan(jnp.maximum, blk_seed), 0
        )

        # padded query stream: empty slots replicate the owning column's
        # first query (their results are never read back)
        seed_q = jnp.minimum(col_start[blk_col], M - 1)
        slot_q = jnp.repeat(seed_q, qblk)
        slot_q = slot_q.at[pos].set(
            jnp.arange(M, dtype=jnp.int32), mode="drop"
        )
        qs_pad = q[qord[jnp.clip(slot_q, 0, M - 1)]]

        # per-block z-range over REAL queries only
        z_fill_lo = jnp.full((nblk * qblk,), Gz, jnp.int32).at[pos].set(
            s_qz, mode="drop"
        )
        z_lo = jnp.min(z_fill_lo.reshape(nblk, qblk), axis=1)
        z_lo = jnp.where(z_lo >= Gz, 0, z_lo)
        z_fill_hi = jnp.full((nblk * qblk,), -1, jnp.int32).at[pos].set(
            s_qz, mode="drop"
        )
        z_hi = jnp.maximum(jnp.max(z_fill_hi.reshape(nblk, qblk), axis=1), 0)
        bz_lo = jnp.maximum(z_lo - 1, 0)
        bz_hi = jnp.minimum(z_hi + 1, Gz - 1)

        bcx = blk_col // G
        bcy = blk_col % G
        entries = []
        dst = jnp.zeros((nblk,), jnp.int32)
        overflow = jnp.zeros((nblk,), bool)
        for dxx in (-1, 0, 1):
            for dyy in (-1, 0, 1):
                nx = bcx + dxx
                ny = bcy + dyy
                okc = (nx >= 0) & (nx < G) & (ny >= 0) & (ny < G)
                nc = jnp.clip(nx, 0, G - 1) * G + jnp.clip(ny, 0, G - 1)
                s = starts[nc * Gz + bz_lo]
                e = starts[nc * Gz + bz_hi + 1]
                ln = jnp.where(okc, e - s, 0)
                overflow = overflow | (ln > _RUN_CAP)
                ln = jnp.minimum(ln, _RUN_CAP)
                s = jnp.clip(s, 0, n_pad - _RUN_PAD)
                delta = s - (s // 128) * 128
                width = -(-(delta + ln) // 128) * 128
                overflow = overflow | (dst + width > w_lanes)
                entry_dst = jnp.clip(dst, 0, w_lanes - 128)
                entries.append(jnp.stack([s, entry_dst, ln], axis=1))
                dst = dst + width
        tab = jnp.stack(entries, axis=1)  # [nblk, 9, 3]
        bound = jnp.min(cs)
        used = col_pad_start[-1] // qblk  # blocks holding real queries
        return (
            p4, qs_pad, qord, pos, tab, overflow, bound, margin, point_ok,
            used,
        )

    # one traced prep, batched: trace time and HLO size stay flat in B
    (
        p4, qs_pad, qord, pos, tab, overflow, bound, margin, point_ok,
        used,
    ) = jax.vmap(prep)(xyz, new_xyz, valid)
    qs = qs_pad.reshape(B, nblk * qblk, 3)
    tab_blk = tab.reshape(B, nblk, _NRUNS * 3).astype(jnp.int32)
    nblk8 = _round_up(nblk, 8)
    tab_blk = jnp.pad(tab_blk, ((0, 0), (0, nblk8 + 8 - nblk), (0, 0)))
    # overlapping 16-row groups (rows [8g, 8g+16)): block m's SMEM slice
    # carries its own group AND the next group's head so the cross-block
    # prefetch can read block m+1's run table (block-unit index maps can't
    # express overlap, so the overlap is materialized — the table is tiny)
    # the per-sample used-block count rides as a 28th table column (a
    # separate (1, 1) SMEM operand violates the block-shape divisibility
    # rule)
    used_col = jnp.broadcast_to(
        used.astype(jnp.int32)[:, None, None], (B, nblk8 + 8, 1)
    )
    tab_blk = jnp.concatenate([tab_blk, used_col], axis=-1)
    g_idx = (
        jnp.arange(nblk8 // 8)[:, None] * 8 + jnp.arange(16)[None, :]
    )
    tab_pairs = tab_blk[:, g_idx]  # [B, nblk8/8, 16, 28]

    idx_s, dist_s = pl.pallas_call(
        functools.partial(_window_kernel, k, w_lanes),
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 16, _NRUNS * 3 + 1), lambda b, m: (b, m // 8, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, qblk, 3), lambda b, m: (b, m, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, qblk, k_pad), lambda b, m: (b, m, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, qblk, k_pad), lambda b, m: (b, m, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 2 * (w_lanes + _RUN_PAD)), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _NRUNS)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, nblk * qblk, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, nblk * qblk, k_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(tab_pairs, p4, qs)
    idx_s = idx_s[:, :, :k]
    dist_s = dist_s[:, :, :k]

    fb = min(fallback_max, M)
    # measured failure counts on production shapes are O(10) per sample
    # (tools/knn_window_stats.py), so the first tier is small — a tier's
    # brute cost is size-proportional via the matched chunk width below
    tiers = sorted({min(32, fb), min(512, fb), fb})

    def post(args):
        """Unpad one sample's kernel results + tiered exact fallback.

        Runs under lax.map (not vmap): the guarded lax.switch stays a real
        branch — the brute-force subgraph is traced ONCE and executed only
        for samples whose guard fired, instead of being duplicated per
        sample (Python unroll) or select-executed always (vmap).
        """
        (
            idx_b, dist_b, qord_b, pos_b, overflow_b, bound_b, margin_b,
            ok_b, xyz_b, q_b,
        ) = args
        # padded-slot results back to original query order: sorted query i
        # sits at padded slot pos[i] and original row qord[i]
        oi = jnp.zeros((M, k), jnp.int32).at[qord_b].set(
            idx_b[pos_b], mode="drop"
        )
        od = jnp.zeros((M, k), jnp.float32).at[qord_b].set(
            dist_b[pos_b], mode="drop"
        )
        q_overflow = jnp.zeros((M,), bool).at[qord_b].set(
            overflow_b[jnp.clip(pos_b // qblk, 0, nblk - 1)], mode="drop"
        )
        kth = od[:, -1]
        kth_bad = kth > (bound_b - margin_b) * 0.999
        bad = kth_bad | q_overflow
        # guard-tuning diagnostics (debug_counts): why queries fell back
        stats = jnp.stack(
            [
                jnp.sum(bad.astype(jnp.int32)),
                jnp.sum(kth_bad.astype(jnp.int32)),
                jnp.sum(q_overflow.astype(jnp.int32)),
                jnp.sum((margin_b > 0).astype(jnp.int32)),
            ]
        )

        def brute(queries, ch=512):
            CH = min(ch, 512)
            m = queries.shape[0]
            mp = _round_up(m, CH)
            qp = jnp.pad(queries, ((0, mp - m), (0, 0))).reshape(
                mp // CH, CH, 3
            )

            def one(qc_):
                d2_ = jnp.sum(
                    jnp.square(qc_[:, None, :] - xyz_b[None, :, :]), axis=-1
                )
                d2_ = jnp.where(ok_b[None, :], d2_, BIG_DIST2)
                return _extract_rounds(
                    d2_,
                    jnp.broadcast_to(
                        jnp.arange(N, dtype=jnp.int32)[None], d2_.shape
                    ),
                    k,
                )

            fi, fd = jax.lax.map(one, qp)
            return fi.reshape(mp, k)[:m], fd.reshape(mp, k)[:m]

        n_bad = jnp.sum(bad.astype(jnp.int32))

        def make_resolver(size):
            def resolve(acc):
                oi, od = acc
                p_ = jnp.nonzero(bad, size=size, fill_value=M)[0]
                fi, fd = brute(q_b[jnp.clip(p_, 0, M - 1)], ch=max(8, size))
                return (
                    oi.at[p_].set(fi, mode="drop"),
                    od.at[p_].set(fd, mode="drop"),
                )

            return resolve

        branches = [lambda acc: acc]
        branches += [make_resolver(s) for s in tiers]
        branches.append(lambda acc: brute(q_b))
        sel = jnp.searchsorted(
            jnp.asarray([1] + [t + 1 for t in tiers]), n_bad, side="right"
        )
        oi, od = jax.lax.switch(sel, branches, (oi, od))
        if debug_counts:
            return oi, od, stats
        return oi, od

    return jax.lax.map(
        post,
        (
            idx_s, dist_s, qord, pos, overflow, bound, margin,
            point_ok, xyz, new_xyz,
        ),
    )
