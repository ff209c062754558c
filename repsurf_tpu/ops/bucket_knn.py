"""Spatial bucket-grid kNN — the scene-scale alternative to the O(Q*N) scan.

The exact kNN kernels (ops/neighbors.py, ops/pallas/knn.py) scan every point
for every query.  At S3DIS densities (80k points, k<=32 within ~0.2 m) a
uniform voxel grid reduces the candidate set per query from N to the ~27
neighboring cells' occupants — about two orders of magnitude less work.

Status: algorithmically validated (exact agreement with the brute-force
kernels under the contract below; candidate sets shrink ~30x at S3DIS
densities) but NOT yet the fast path on TPU — the per-query candidate
gathers lower to XLA's scalar gather and dominate (~5 s vs the Pallas scan
kernel's 0.5 s at scene scale).  The planned round-2 version processes
queries grouped by cell with scalar-prefetched candidate windows in a
Pallas kernel, turning the gathers into contiguous DMAs.

Static-shape formulation (everything jit-compatible):
  1. assign each point a cell id on a G^3 grid of pitch `cell_size`;
  2. sort points by cell id; per-cell [start, end) via searchsorted;
  3. per query, gather up to `cell_cap` candidates from each of the 27
     neighboring cells (static [Q, 27*cell_cap] candidate table, empty slots
     padded with the big-distance sentinel);
  4. k-round extraction over the candidate table.

Exactness contract (checked by the companion verifier, not per-call):
  * the true k-th neighbor distance must be < cell_size (otherwise it can
    live outside the 27-cell neighborhood), and
  * no cell may hold more than cell_cap points.
Under the reference's S3DIS configuration (voxel-grid-sampled scenes with
0.04 m spacing, k<=32) both hold comfortably for cell_size ~0.25-0.5 m.
`bucket_knn_check` reports violations so callers can fall back to the exact
kernels when the contract is at risk.
"""

import functools

import jax
import jax.numpy as jnp

from .masking import BIG_DIST2, counts_to_mask


def _cell_ids(xyz, origin, cell_size, grid):
    g = jnp.clip(
        jnp.floor((xyz - origin) / cell_size).astype(jnp.int32), 0, grid - 1
    )
    return (g[..., 0] * grid + g[..., 1]) * grid + g[..., 2], g


@functools.partial(jax.jit, static_argnames=("k", "grid", "cell_cap", "chunk"))
def bucket_knn(
    k, xyz, new_xyz, cell_size, valid=None, grid=16, cell_cap=128, chunk=1024
):
    """Bucketed kNN over a G^3 grid.

    Args:
      k: static neighbor count.
      xyz: [B, N, 3] points; new_xyz: [B, M, 3] queries.
      cell_size: grid pitch (must exceed the k-th neighbor distance).
      valid: optional [B] counts.
      grid: static cells per axis.
      cell_cap: static max points read per cell (overflow drops points —
        see bucket_knn_check).

    Returns:
      (idx [B, M, k] int32, dist [B, M, k] f32) — same conventions as
      ops.neighbors.knn.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    n_cells = grid * grid * grid
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    if valid is None:
        point_ok = jnp.ones((B, N), dtype=bool)
    else:
        point_ok = counts_to_mask(valid, N)

    def per_sample(p, q, ok):
        origin = jnp.min(jnp.where(ok[:, None], p, jnp.inf), axis=0)
        cid, _ = _cell_ids(p, origin, cell_size, grid)
        cid = jnp.where(ok, cid, n_cells)  # padding sorts to the end
        order = jnp.argsort(cid).astype(jnp.int32)
        cid_sorted = jnp.sort(cid)
        starts = jnp.searchsorted(cid_sorted, jnp.arange(n_cells + 1))

        off = jnp.arange(-1, 2)
        d3 = jnp.stack(jnp.meshgrid(off, off, off, indexing="ij"), -1).reshape(
            27, 3
        )
        slot = jnp.arange(cell_cap, dtype=jnp.int32)

        def one_chunk(qc):
            m = qc.shape[0]
            _, qg = _cell_ids(qc, origin, cell_size, grid)
            nbr = qg[:, None, :] + d3[None, :, :]  # [m, 27, 3]
            in_grid = jnp.all((nbr >= 0) & (nbr < grid), axis=-1)
            nbr = jnp.clip(nbr, 0, grid - 1)
            nbr_id = (nbr[..., 0] * grid + nbr[..., 1]) * grid + nbr[..., 2]
            c_start = starts[nbr_id]  # [m, 27]
            c_end = jnp.where(in_grid, starts[nbr_id + 1], c_start)

            cand_pos = c_start[..., None] + slot  # [m, 27, cap] sorted order
            cand_valid = cand_pos < c_end[..., None]
            cand_pos = jnp.minimum(cand_pos, N - 1)
            cand_idx = order[cand_pos.reshape(m, -1)]  # [m, 27*cap]
            cand_xyz = p[cand_idx]  # [m, 27*cap, 3]
            d2 = jnp.sum(jnp.square(cand_xyz - qc[:, None, :]), axis=-1)
            d2 = jnp.where(cand_valid.reshape(m, -1), d2, BIG_DIST2)

            # k-round extraction over the small candidate table
            cc = d2.shape[1]
            col = jnp.arange(cc, dtype=jnp.int32)[None, :]
            idxs, ds = [], []
            for _ in range(k):
                j = jnp.argmin(d2, axis=-1)
                d = jnp.minimum(jnp.min(d2, axis=-1), BIG_DIST2)
                idxs.append(
                    jnp.take_along_axis(cand_idx, j[:, None], axis=1)[:, 0]
                )
                ds.append(d)
                d2 = jnp.where(col == j[:, None], jnp.inf, d2)
            idx = jnp.stack(idxs, -1).astype(jnp.int32)
            dist2 = jnp.stack(ds, -1)
            idx = jnp.where(dist2 >= BIG_DIST2, 0, idx)
            return idx, jnp.sqrt(dist2)

        c = min(chunk, M)
        n_chunks = -(-M // c)
        qp = jnp.pad(q, ((0, n_chunks * c - M), (0, 0))).reshape(n_chunks, c, 3)
        idxs, dists = jax.lax.map(one_chunk, qp)
        return (
            idxs.reshape(n_chunks * c, k)[:M],
            dists.reshape(n_chunks * c, k)[:M],
        )

    return jax.vmap(per_sample)(xyz, new_xyz, point_ok)


@functools.partial(jax.jit, static_argnames=("grid", "cell_cap"))
def bucket_knn_check(xyz, cell_size, kth_dist, valid=None, grid=16, cell_cap=128):
    """Contract check: returns (max_cell_count, radius_ok) where radius_ok is
    True iff every provided k-th-neighbor distance is < cell_size.  Callers
    compare max_cell_count <= cell_cap and radius_ok before trusting
    bucket_knn as exact."""
    B, N, _ = xyz.shape
    n_cells = grid**3
    if valid is None:
        point_ok = jnp.ones((B, N), dtype=bool)
    else:
        point_ok = counts_to_mask(valid, N)

    def per_sample(p, ok):
        origin = jnp.min(jnp.where(ok[:, None], p, jnp.inf), axis=0)
        cid, _ = _cell_ids(p.astype(jnp.float32), origin, cell_size, grid)
        cid = jnp.where(ok, cid, n_cells)
        counts = jnp.zeros((n_cells + 1,), jnp.int32).at[cid].add(1)
        return jnp.max(counts[:-1])

    max_count = jnp.max(jax.vmap(per_sample)(xyz, point_ok))
    radius_ok = jnp.all(kth_dist < cell_size)
    return max_count, radius_ok
