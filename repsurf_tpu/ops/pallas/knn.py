"""Pallas TPU kernel for exact k-nearest-neighbors.

The XLA extraction formulation (ops/neighbors.py) re-streams the [Q, N]
distance tile from HBM on every one of the k argmin rounds — at scene scale
(Q=20k, N=80k, k=32) that is ~10 GB of traffic per call.  This kernel
computes each query block's distance rows once into VMEM (v5e has 128 MB)
and runs all k extraction rounds there via ``fori_loop``, so HBM sees only
the points, the queries, and the [Q, k] outputs.

Two sizing lessons baked in: an unrolled k-loop spills the register
allocator (~116 MB of spill slots), and per-iteration [rows, N] temporaries
(iota, masks, the updated distance array) each cost rows*N*4 bytes — the
query-block height is sized so ~4 such arrays fit.  Per-round results are
accumulated into a [rows, k] scratch with a lane one-hot (dynamic
lane-indexed stores are unsupported) and written out once.

Distances are computed as direct coordinate differences — like the reference
CUDA kernel (segmentation knnquery_cuda_kernel.cu:92-96) and *unlike* the
XLA twin's |q|^2+|p|^2-2qp form, which loses ~1e-3 to cancellation on
near-zero distances.  Index results are identical; self-distances here are
exactly 0.  Otherwise semantics match ops/neighbors.knn: ascending
distances, lowest-index ties, missing slots = (idx 0, dist sqrt(1e10)).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..masking import BIG_DIST2


def _knn_kernel(
    k, valid_sref, xyz_ref, q_ref, idx_ref, dist_ref, d2_ref, acc_i_ref, acc_d_ref
):
    rows, n = d2_ref.shape
    k_pad = acc_i_ref.shape[1]
    b = pl.program_id(0)
    px = xyz_ref[0, 0:1, :]  # [1, N]
    py = xyz_ref[0, 1:2, :]
    pz = xyz_ref[0, 2:3, :]
    qx = q_ref[0, :, 0:1]  # [rows, 1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    def col():
        return jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)

    d2 = jnp.square(qx - px) + jnp.square(qy - py) + jnp.square(qz - pz)
    d2 = jnp.where(col() < valid_sref[b], d2, BIG_DIST2)
    d2_ref[:] = d2
    acc_i_ref[:] = jnp.zeros((rows, k_pad), jnp.int32)
    acc_d_ref[:] = jnp.zeros((rows, k_pad), jnp.float32)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rows, k_pad), 1)

    def body(r, _):
        d2 = d2_ref[:]
        # min + masked-min beats Mosaic's argmin lowering by ~25%; the
        # second min over the index column keeps the lowest-index tie-break
        m = jnp.min(d2, axis=1)
        i = jnp.min(jnp.where(d2 == m[:, None], col(), n), axis=1).astype(
            jnp.int32
        )
        d = jnp.minimum(m, BIG_DIST2)  # sentinels saturate
        pad = d >= BIG_DIST2
        i_out = jnp.where(pad, 0, i)
        slot = lane_k == r
        acc_i_ref[:] = jnp.where(slot, i_out[:, None], acc_i_ref[:])
        acc_d_ref[:] = jnp.where(slot, jnp.sqrt(d)[:, None], acc_d_ref[:])
        d2_ref[:] = jnp.where(col() == i[:, None], jnp.inf, d2)
        return 0

    jax.lax.fori_loop(0, k, body, 0)
    idx_ref[0] = acc_i_ref[:]
    dist_ref[0] = acc_d_ref[:]


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("k", "block_q", "interpret"))
def knn_pallas(k, xyz, new_xyz, valid=None, block_q=None, interpret=False):
    """Pallas implementation of ops.neighbors.knn.

    Args:
      k: static neighbor count (<= 256).
      xyz: [B, N, 3] reference points.
      new_xyz: [B, M, 3] queries.
      valid: optional [B] int32 counts for xyz.

    Returns:
      (idx [B, M, k] int32, dist [B, M, k] float32).
    """
    if k > 256:
        raise ValueError("knn_pallas supports k <= 256")
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    if valid is None:
        valid = jnp.full((B,), N, jnp.int32)

    n_pad = max(_round_up(N, 128), 256)
    if block_q is None:
        # ~4 live [block_q, n] f32 arrays within ~80 MB of the 128 MB VMEM;
        # capped at 256: measured 2.9 ms vs 3.6 (512) / 4.6 (1024) for k=9
        # self-query at batch 64 x 1024 — smaller blocks pipeline better,
        # but 128 collapses (16 ms: per-block overhead dominates)
        block_q = max(8, min(256, (80 * 2**20 // (n_pad * 4 * 4)) // 8 * 8))
    m_pad = _round_up(M, block_q)
    k_pad = _round_up(k, 128)  # lane-width output tiles

    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [B, 3, N]
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))
    q = jnp.pad(new_xyz.astype(jnp.float32), ((0, 0), (0, m_pad - M), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the [B] valid counts ride in SMEM
        grid=(B, m_pad // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, 3, n_pad),
                lambda b, m, valid_s: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_q, 3),
                lambda b, m, valid_s: (b, m, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, block_q, k_pad),
                lambda b, m, valid_s: (b, m, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_q, k_pad),
                lambda b, m, valid_s: (b, m, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, n_pad), jnp.float32),
            pltpu.VMEM((block_q, k_pad), jnp.int32),
            pltpu.VMEM((block_q, k_pad), jnp.float32),
        ],
    )
    idx, dist = pl.pallas_call(
        functools.partial(_knn_kernel, k),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, m_pad, k_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, m_pad, k_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 2**20),
        interpret=interpret,
    )(valid.astype(jnp.int32), xyz_t, q)
    return idx[:, :M, :k], dist[:, :M, :k]
