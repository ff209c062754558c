"""Pallas TPU kernel for furthest-point sampling.

The XLA formulation (ops/sampling.py) round-trips the [B, N] running
min-distance array and the selection state through HBM on every one of the
npoint sequential iterations (~96 ms for batch 64 x 2048 -> 1024 on v5e).
This kernel keeps everything — coordinates, running distances, the lane-index
iota — resident in VMEM for the whole loop, so each iteration is a handful of
VPU passes over [rows, N] with no HBM traffic (~0.76 ms for the same shape:
126x).

Semantics are identical to ops/sampling.farthest_point_sample (seed index 0,
running min-distance, argmax with first-index tie-break, padding rows never
selected); property tests check exact index equality against the XLA/oracle
versions.  One benign exception: once a sample's valid points are exhausted
(npoint > valid[b]) the remaining slots repeat already-selected points, and
Mosaic's argmax may break the all-zero tie differently than XLA — those
slots are masked by callers via m_valid either way.  Validity is folded into the distance init: invalid lanes start at
-1, every real squared distance is >= 0, so `min` never raises them and
argmax never picks them — this removes a whole [rows, N] mask array from the
VMEM working set (matters at scene scale: N = 80k, rows = 8 is ~13 MB live).

Layout: coord-major [3, B, N] puts N on the 128-wide lane axis; the batch is
processed in row blocks sized to fit VMEM; the output is written [npoint, B]
(dynamic stores are sublane-indexed — Mosaic has no dynamic lane-offset
store) and transposed on the way out.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(npoint, with_xyz, xyz_ref, valid_ref, *refs):
    if with_xyz:
        idx_ref, xyz_out_ref, tmp_ref = refs
    else:
        (idx_ref, tmp_ref) = refs
        xyz_out_ref = None
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    rows, n = x.shape

    def col():
        # regenerated at each use: a stored [rows, n] iota costs 2.5 MB of
        # VMEM at scene scale (n=80k) and iota generation is ~free
        return jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)

    # invalid lanes start below every real distance and stay there
    tmp_ref[:] = jnp.where(col() < valid_ref[:], 1e10, -1.0)

    def one_round(i, far):
        idx_ref[pl.ds(i, 1), :] = far.reshape(1, rows)
        sel = col() == far  # one-hot row of the current centroid
        cx = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        if xyz_out_ref is not None:
            # the selected centroid's coordinates are already in registers:
            # emitting them here replaces the caller's post-kernel gather
            # (~1 ms of one-hot build at batch 64 x 2048 -> 1024)
            xyz_out_ref[0, pl.ds(i, 1), :] = cx.reshape(1, rows)
            xyz_out_ref[1, pl.ds(i, 1), :] = cy.reshape(1, rows)
            xyz_out_ref[2, pl.ds(i, 1), :] = cz.reshape(1, rows)
        d2 = jnp.square(x - cx) + jnp.square(y - cy) + jnp.square(z - cz)
        tmp = jnp.minimum(tmp_ref[:], d2)
        tmp_ref[:] = tmp
        # manual max + masked-iota-min beats Mosaic's argmax lowering ~25%
        # (see ops/pallas/knn.py) and makes the first-index tie-break
        # explicit instead of relying on the lowering's choice
        m = jnp.max(tmp, axis=1)
        far = jnp.min(
            jnp.where(tmp == m[:, None], col(), n), axis=1
        ).astype(jnp.int32)
        return far[:, None]

    jax.lax.fori_loop(
        0, npoint, one_round, jnp.zeros((rows, 1), jnp.int32)
    )


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("npoint", "block_rows", "interpret", "return_xyz"),
)
def fps_pallas(
    xyz, npoint, valid=None, block_rows=None, interpret=False,
    return_xyz=False,
):
    """Pallas implementation of farthest_point_sample.

    Args:
      xyz: [B, N, 3] float.
      npoint: static sample count.
      valid: optional [B] int32 counts.
      interpret: run in interpreter mode (CPU testing).
      return_xyz: also return the sampled coordinates [B, npoint, 3]
        (captured in-kernel — equals index_points(xyz, idx) exactly).

    Returns:
      idx: [B, npoint] int32 (and sampled_xyz if return_xyz).
    """
    # integer indices carry no gradient, but an input that structurally
    # carries a tangent (e.g. centers sliced out of a fused gather that
    # also returned param-dependent channels) would invoke the Pallas JVP
    # rule, which does not support kernels with scratch buffers
    xyz = jax.lax.stop_gradient(xyz)
    B, N, _ = xyz.shape
    if valid is None:
        valid = jnp.full((B,), N, jnp.int32)

    # minimum two lane tiles: single-tile (N=128) argmax trips a Mosaic
    # conversion-cast bug; extra lanes are masked out via the valid counts
    n_pad = max(_round_up(N, 128), 256)
    if block_rows is None:
        # ~6 live [rows, n] f32-sized arrays; budget ~12 MB of VMEM
        budget_rows = (12 * 2**20) // (n_pad * 4 * 6)
        block_rows = max(8, min(_round_up(B, 8), budget_rows // 8 * 8))
    b_pad = _round_up(B, block_rows)
    m_pad = _round_up(npoint, 8)

    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # [3, B, N]
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, b_pad - B), (0, n_pad - N)))
    valid_c = jnp.pad(valid.astype(jnp.int32), (0, b_pad - B))[:, None]

    grid = (b_pad // block_rows,)
    out_specs = [
        pl.BlockSpec(
            (m_pad, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((m_pad, b_pad), jnp.int32)]
    if return_xyz:
        out_specs.append(
            pl.BlockSpec(
                (3, m_pad, block_rows),
                lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((3, m_pad, b_pad), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fps_kernel, m_pad, return_xyz),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3, block_rows, n_pad),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_rows, n_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(xyz_t, valid_c)
    idx = out[0]
    if return_xyz:
        sampled = jnp.transpose(out[1], (2, 1, 0))[:B, :npoint]
        return idx.T[:B, :npoint], sampled
    return idx.T[:B, :npoint]
