"""Sectorized furthest-point sampling (static-shape TPU reformulation).

The reference (segmentation/modules/pointops/functions/pointops.py:52-111)
splits each scene into azimuthal sectors in *Python* — per-sector point counts
are data-dependent — and runs offset-FPS once over the sector-reordered cloud.
The payoff: FPS's sequential loop shrinks by the sector count (30-40% train
time, segmentation/README.md:93) because sectors sample independently.

TPU reformulation with static shapes:
  1. sort points by azimuth ``atan2(x, y)`` (reference angle convention);
  2. split the sorted *ranks* into ``num_sectors`` equal-count contiguous
     runs (the reference uses equal angle ranges; equal counts is the
     static-shape analog and is better balanced — documented deviation);
  3. slice each run into a fixed-size [n_sectors, N_sec] buffer and run the
     batched masked FPS over all B * S sectors in parallel (the sequential
     loop is now npoint / S long);
  4. take the first ``m // S`` selections from each sector (last sector gets
     the remainder, as in the reference) and compact them into [B, npoint].

Deviation from the reference (documented): the ``min_points=10000`` gate that
disables sectoring for small scenes is not replicated — equal-count sectors
stay balanced at any size, so the gate's motivation (degenerate tiny sectors)
does not arise.
"""

import functools

import jax
import jax.numpy as jnp

from .sampling import farthest_point_sample


@functools.partial(jax.jit, static_argnames=("npoint", "num_sectors"))
def sectorized_fps(xyz, npoint, num_sectors, valid=None, m_valid=None):
    """Sector-parallel masked FPS.

    Args:
      xyz: [B, N, 3].
      npoint: static int, max samples per batch element (output width).
      num_sectors: static int S.
      valid: optional [B] count of real input points.
      m_valid: optional [B] actual per-sample number of samples wanted
        (<= npoint); defaults to npoint.  Output rows beyond m_valid[b] repeat
        the first selection.

    Returns:
      idx: [B, npoint] int32 indices into N.
    """
    B, N, _ = xyz.shape
    S = num_sectors
    if valid is None:
        valid = jnp.full((B,), N, dtype=jnp.int32)
    if m_valid is None:
        m_valid = jnp.full((B,), npoint, dtype=jnp.int32)
    n = jnp.maximum(valid, 1).astype(jnp.int32)

    # 1. sort by azimuth; padding sorts last (key +inf keeps packed-front).
    angle = jnp.arctan2(xyz[..., 0], xyz[..., 1])
    ar = jnp.arange(N, dtype=jnp.int32)
    angle = jnp.where(ar[None, :] < valid[:, None], angle, jnp.inf)
    order = jnp.argsort(angle, axis=-1).astype(jnp.int32)  # [B, N] rank->orig
    xyz_sorted = jnp.take_along_axis(xyz, order[..., None], axis=1)

    # 2. equal-count contiguous rank runs: sector s covers
    #    ranks [ceil(s*n/S), ceil((s+1)*n/S)).
    s_ar = jnp.arange(S + 1, dtype=jnp.int32)
    bounds = -((-s_ar[None, :] * n[:, None]) // S)  # [B, S+1] ceil division
    starts = bounds[:, :-1]  # [B, S]
    counts = bounds[:, 1:] - bounds[:, :-1]  # [B, S]

    # 3. fixed-size sector buffers via dynamic slices of the sorted cloud.
    n_sec = -(-N // S)  # static max sector length
    xyz_padded = jnp.pad(xyz_sorted, ((0, 0), (0, n_sec), (0, 0)))

    def slice_sector(pts, start):
        return jax.lax.dynamic_slice(pts, (start, 0), (n_sec, 3))

    sector_xyz = jax.vmap(lambda pts, st: jax.vmap(lambda s: slice_sector(pts, s))(st))(
        xyz_padded, starts
    )  # [B, S, n_sec, 3]

    m_sec = npoint // S + npoint % S + (S - 1)  # static cap per sector
    m_sec = min(m_sec, n_sec)
    idx_sec = farthest_point_sample(
        sector_xyz.reshape(B * S, n_sec, 3), m_sec, valid=counts.reshape(B * S)
    ).reshape(B, S, m_sec)

    # map sector-local index -> sorted rank -> original index
    rank = starts[:, :, None] + idx_sec  # [B, S, m_sec]
    rank = jnp.minimum(rank, N - 1)
    orig = jnp.take_along_axis(order, rank.reshape(B, S * m_sec), axis=1)
    orig = orig.reshape(B, S, m_sec)

    # 4. per-sector take counts: m // S, last sector += m % S (reference
    #    functions/pointops.py:84-85), clipped at the sector population.
    base = m_valid // S
    take = jnp.tile(base[:, None], (1, S))
    take = take.at[:, -1].add(m_valid % S)
    take = jnp.minimum(take, counts)
    offs = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(take, axis=1)[:, :-1]], axis=1
    )  # [B, S] output offsets

    j_ar = jnp.arange(m_sec, dtype=jnp.int32)
    keep = j_ar[None, None, :] < take[:, :, None]  # [B, S, m_sec]
    out_pos = jnp.where(keep, offs[:, :, None] + j_ar[None, None, :], npoint)

    out = jnp.zeros((B, npoint), dtype=jnp.int32)
    out = jax.vmap(lambda o, p, v: o.at[p.reshape(-1)].set(v.reshape(-1), mode="drop"))(
        out, out_pos, orig
    )
    # fill unwritten tail (rows >= sum(take)) with the first selection
    total = jnp.sum(take, axis=1)
    m_ar = jnp.arange(npoint, dtype=jnp.int32)
    out = jnp.where(m_ar[None, :] < total[:, None], out, out[:, :1])
    return out
