"""Fused umbrella-fan Pallas kernel.

The umbrella constructor's geometry stage — kNN, neighbor gather, azimuth
sort, fan pairing, triangle normal/center/const, degenerate-fan repair
(classification/modules/repsurface_utils.py:112-132 + recons_utils.py:27-176,
and the segmentation twins) — runs as ~a dozen separate XLA ops in the
baseline path (geometry/umbrella.py + geometry/surface.py), each streaming
[B, N, G, ...] tensors through HBM (~19 ms of the ~27 ms classification
forward at batch 64).

This kernel computes the whole chain in one VMEM-resident pass:

  * distance rows [block_q, N] are computed once (direct coordinate
    differences, like ops/pallas/knn.py) and the k neighbors extracted by
    argmin rounds; neighbor *coordinates* are captured during extraction via
    the same select mask, so no index gather ever happens;
  * per-fan quantities live in the 128 lanes of [block_q, 128] arrays
    (lane g = fan g), making the azimuth rank-sort, successor pairing,
    cross products, polar transform and first-good-fan repair lane-parallel
    VPU code with no HBM traffic;
  * the 10 feature channels are packed to output lanes g*C + c with constant
    one-hot permutation matmuls (MXU) — [B, M, G*C] comes out dense.

Semantics are bit-compatible with the XLA path (same guarded formulas from
geometry/polar.py and geometry/surface.py, same stable azimuth rank as
jnp.argsort, same kNN extraction order): exact-match tests run both paths in
interpreter mode.  The per-sample random normal inversion is NOT applied here
— it is a per-sample scalar sign on the normal/const channels that the
caller applies outside (it commutes with the repair gather because the sign
is uniform within a sample).

No VJP is defined: in both reference pipelines the input points are data
(nothing upstream requires d(feat)/d(xyz)); the constructor's trainable
parameters all sit in the MLP *after* this op.  Differentiating through it
raises, and the XLA path remains for research that needs point gradients.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...geometry.umbrella import FIXED_ROTATION_ROWS
from ..masking import BIG_DIST2
from .math import acos, atan2

_LANES = 128
_PI = float(jnp.pi)


def _feature_order(style, return_dist):
    """Channel order within a fan, matching the reference concat orders.

    cls (classification/modules/repsurface_utils.py:290):
        [center, polar, normal, pos]
    seg (segmentation/modules/repsurface_utils.py:320):
        [polar, normal, pos, center]
    no-dist (both): [center, polar, normal]
    """
    if not return_dist:
        return ("cx", "cy", "cz", "rho", "theta", "phic", "ux", "uy", "uz")
    if style == "seg":
        return ("rho", "theta", "phic", "ux", "uy", "uz", "posv", "cx", "cy", "cz")
    return ("cx", "cy", "cz", "rho", "theta", "phic", "ux", "uy", "uz", "posv")


def _split3_kernel(x):
    """f32 -> three bf16 terms summing exactly to x (mantissa masking, the
    in-kernel twin of ops/gather._split_bf16_terms)."""
    mask = jnp.uint32(0xFFFF0000)
    b1 = pltpu.bitcast(x, jnp.uint32) & mask
    v1 = pltpu.bitcast(b1, jnp.float32)
    r1 = x - v1
    b2 = pltpu.bitcast(r1, jnp.uint32) & mask
    v2 = pltpu.bitcast(b2, jnp.float32)
    v3 = r1 - v2
    return (
        v1.astype(jnp.bfloat16),
        v2.astype(jnp.bfloat16),
        v3.astype(jnp.bfloat16),
    )


def _umbrella_kernel(
    k, skip, rotate, return_dist, style,
    valid_sref, xyz_ref, xyzp_ref, q_ref, out_ref, d2_ref,
):
    rows, n = d2_ref.shape
    g_count = k - skip
    names = _feature_order(style, return_dist)
    c_count = len(names)
    b = pl.program_id(0)

    px = xyz_ref[0, 0:1, :]  # [1, N]
    py = xyz_ref[0, 1:2, :]
    pz = xyz_ref[0, 2:3, :]
    qx = q_ref[0, :, 0:1]  # [rows, 1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]
    p0x = px[0:1, 0:1]  # point 0: the kNN padding target
    p0y = py[0:1, 0:1]
    p0z = pz[0:1, 0:1]
    # [N, 3] points for the MXU coordinate capture, split into exact bf16
    # terms once per program
    P1, P2, P3 = _split3_kernel(xyzp_ref[0])

    def col():
        return jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)

    d2 = jnp.square(qx - px) + jnp.square(qy - py) + jnp.square(qz - pz)
    d2_ref[:] = jnp.where(col() < valid_sref[b], d2, BIG_DIST2)

    # -- kNN extraction; neighbor coords drop into lane (round - skip) -------
    def body(r, carry):
        gx, gy, gz = carry
        d2 = d2_ref[:]
        # min + masked-min beats Mosaic's argmin lowering (see knn.py); the
        # second min keeps the lowest-index tie-break
        dmin = jnp.min(d2, axis=1)
        i = jnp.min(
            jnp.where(d2 == dmin[:, None], col(), n), axis=1
        ).astype(jnp.int32)
        sel = col() == i[:, None]
        # coordinate capture on the MXU: the one-hot row has exactly one
        # non-zero, so the 3-term bf16 contraction reproduces the f32
        # coordinates exactly at ~2x the speed of three masked VPU reduces
        selb = sel.astype(jnp.bfloat16)
        cap = (
            jnp.dot(selb, P1, preferred_element_type=jnp.float32)
            + jnp.dot(selb, P2, preferred_element_type=jnp.float32)
            + jnp.dot(selb, P3, preferred_element_type=jnp.float32)
        )  # [rows, 3]
        cxv = cap[:, 0:1]
        cyv = cap[:, 1:2]
        czv = cap[:, 2:3]
        pad = (dmin >= BIG_DIST2)[:, None]
        cxv = jnp.where(pad, p0x, cxv)
        cyv = jnp.where(pad, p0y, cyv)
        czv = jnp.where(pad, p0z, czv)
        slot = lane == (r - skip)
        gx = jnp.where(slot, cxv, gx)
        gy = jnp.where(slot, cyv, gy)
        gz = jnp.where(slot, czv, gz)
        d2_ref[:] = jnp.where(sel, jnp.inf, d2)
        return gx, gy, gz

    zeros = jnp.zeros((rows, _LANES), jnp.float32)
    gx, gy, gz = jax.lax.fori_loop(0, k, body, (zeros, zeros, zeros))

    # center-relative coordinates (lanes >= g_count hold garbage, masked off)
    gx = gx - qx
    gy = gy - qy
    gz = gz - qz

    # -- azimuth (xyz2sphere phi on the optionally rotated frame) ------------
    if rotate:
        # row-vector times fixed_rotation_matrix, coefficients taken from
        # the SAME tuple the XLA path builds its matrix from
        R = FIXED_ROTATION_ROWS
        xr = R[0][0] * gx + R[1][0] * gy + R[2][0] * gz
        yr = R[0][1] * gx + R[1][1] * gy + R[2][1] * gz
    else:
        xr, yr = gx, gy
    xy0 = (xr == 0.0) & (yr == 0.0)
    phi = atan2(yr, jnp.where(xy0, 1.0, xr)) / (2 * _PI) + 0.5

    def lane_get(arr, j):
        """Extract lane j as [rows, 1]."""
        return jnp.sum(jnp.where(lane == j, arr, 0), axis=1, keepdims=True)

    # -- stable ascending rank (== position under jnp.argsort) ---------------
    rank = jnp.zeros((rows, _LANES), jnp.int32)
    for j in range(g_count):
        pj = lane_get(phi, j)
        beats = (pj < phi) | ((pj == phi) & (j < lane))
        rank = rank + beats.astype(jnp.int32)

    # -- scatter to sorted order: sorted lane rank_j takes fan j's coords ----
    sx = zeros
    sy = zeros
    sz = zeros
    for j in range(g_count):
        rj = lane_get(rank, j)
        put = lane == rj
        sx = jnp.where(put, lane_get(gx, j), sx)
        sy = jnp.where(put, lane_get(gy, j), sy)
        sz = jnp.where(put, lane_get(gz, j), sz)

    # successor fan: roll -1 (== +127 circular; pltpu.roll wants shift >= 0)
    # with the wrap landing at g_count, not at 128
    wrap = lane == (g_count - 1)
    v2x = jnp.where(wrap, lane_get(sx, 0), pltpu.roll(sx, _LANES - 1, axis=1))
    v2y = jnp.where(wrap, lane_get(sy, 0), pltpu.roll(sy, _LANES - 1, axis=1))
    v2z = jnp.where(wrap, lane_get(sz, 0), pltpu.roll(sz, _LANES - 1, axis=1))

    # -- triangle geometry (vertices: centroid 0, v1=sorted, v2=successor) ---
    # normal = cross(v1, v2), unit-normalized with the guarded sqrt of
    # geometry/surface.py:42-45
    nx = sy * v2z - sz * v2y
    ny = sz * v2x - sx * v2z
    nz = sx * v2y - sy * v2x
    s2 = jnp.square(nx) + jnp.square(ny) + jnp.square(nz)
    deg = s2 == 0.0
    norm = jnp.sqrt(jnp.where(deg, 1.0, s2))
    ux = jnp.where(deg, 0.0, nx / norm)
    uy = jnp.where(deg, 0.0, ny / norm)
    uz = jnp.where(deg, 0.0, nz / norm)

    # sign fix: fan 0's unit x decides for all fans (surface.py:47-53)
    sign = jnp.where(lane_get(ux, 0) > 0, 1.0, -1.0)
    ux = ux * sign
    uy = uy * sign
    uz = uz * sign

    # centroid of (0, v1, v2)
    cx = (sx + v2x) / 3.0
    cy = (sy + v2y) / 3.0
    cz = (sz + v2z) / 3.0

    # polar transform of the center (geometry/polar.py:29-43)
    s2c = jnp.square(cx) + jnp.square(cy) + jnp.square(cz)
    zeroc = s2c == 0.0
    rho = jnp.where(zeroc, 0.0, jnp.sqrt(jnp.where(zeroc, 1.0, s2c)))
    u = jnp.clip(cz / jnp.where(zeroc, 1.0, rho), -1.0, 1.0)
    at_pole = jnp.abs(u) >= 1.0
    theta = acos(jnp.where(at_pole, 0.0, u))
    theta = jnp.where(at_pole, jnp.where(u > 0, 0.0, _PI), theta)
    theta = jnp.where(zeroc, 0.0, theta) / _PI
    cxy0 = (cx == 0.0) & (cy == 0.0)
    phic = atan2(cy, jnp.where(cxy0, 1.0, cx)) / (2 * _PI) + 0.5

    if return_dist:
        posv = (ux * cx + uy * cy + uz * cz) / jnp.sqrt(3.0)

    # -- first-good-fan repair (surface.py:119-141; polar stays unrepaired) --
    ok = (~deg) & (lane < g_count)
    fo = jnp.min(jnp.where(ok, lane, _LANES), axis=1, keepdims=True)
    fo = jnp.where(fo >= _LANES, 0, fo)  # all-bad point -> fan 0
    selfo = lane == fo
    badl = deg & (lane < g_count)

    def repaired(arr):
        repl = jnp.sum(jnp.where(selfo, arr, 0.0), axis=1, keepdims=True)
        return jnp.where(badl, repl, arr)

    cx, cy, cz = repaired(cx), repaired(cy), repaired(cz)
    ux, uy, uz = repaired(ux), repaired(uy), repaired(uz)
    if return_dist:
        posv = repaired(posv)

    # -- pack channels to lanes g*C + c via constant one-hot matmuls (MXU) ---
    chans = {
        "cx": cx, "cy": cy, "cz": cz,
        "rho": rho, "theta": theta, "phic": phic,
        "ux": ux, "uy": uy, "uz": uz,
    }
    if return_dist:
        chans["posv"] = posv
    row_l = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    packed = jnp.zeros((rows, _LANES), jnp.float32)
    for c, name in enumerate(names):
        perm = ((col_l == row_l * c_count + c) & (row_l < g_count)).astype(
            jnp.float32
        )
        # HIGHEST: the MXU's default bf16 operand truncation would shave the
        # packed values to 2^-9; with one non-zero per output column the
        # high/low-split passes reproduce the f32 value exactly
        packed = packed + jnp.dot(
            chans[name],
            perm,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[0] = packed


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "drop_self", "rotate", "return_dist", "style", "block_q",
        "interpret",
    ),
)
def umbrella_features_pallas(
    xyz,
    k,
    drop_self=False,
    rotate=False,
    return_dist=True,
    style="cls",
    valid=None,
    block_q=None,
    interpret=False,
):
    """Fused umbrella geometry: points -> per-fan surface features.

    Equivalent to group_by_umbrella + cal_normal(sign-fix, no random_inv) +
    cal_center + xyz2sphere + cal_const + repair_invalid_group + the style's
    channel concat, in one kernel.

    Args:
      xyz: [B, N, 3] cloud (fan centers are the same cloud, as in both
        reference pipelines).
      k: static kNN size (group_size + 1).
      drop_self: classification style — kNN column 0 removed, G = k - 1.
      rotate: segmentation v2 style — azimuth computed in the fixed-rotated
        frame.
      return_dist: include the plane-constant channel.
      style: 'cls' | 'seg' channel concat order.
      valid: optional [B] int32 valid counts.

    Returns:
      feat: [B, N, G, C] float32, C = 10 (return_dist) or 9.
    """
    B, N, _ = xyz.shape
    G = k - 1 if drop_self else k
    C = 10 if return_dist else 9
    if G * C > _LANES:
        raise ValueError(f"umbrella fans*channels {G * C} exceed {_LANES} lanes")
    if valid is None:
        valid = jnp.full((B,), N, jnp.int32)

    n_pad = max(_round_up(N, 128), 256)
    if block_q is None:
        # d2 scratch + ~4 live [rows, n] temporaries within ~80 MB VMEM
        block_q = max(8, min(512, (80 * 2**20 // (n_pad * 4 * 4)) // 8 * 8))
    m_pad = _round_up(N, block_q)

    xyz_f = xyz.astype(jnp.float32)
    xyz_t = jnp.transpose(xyz_f, (0, 2, 1))  # [B, 3, N]
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))
    xyz_p = jnp.pad(xyz_f, ((0, 0), (0, n_pad - N), (0, 0)))  # [B, N, 3]
    q = jnp.pad(xyz_f, ((0, 0), (0, m_pad - N), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, m_pad // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, 3, n_pad), lambda b, m, v: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_pad, 3), lambda b, m, v: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_q, 3), lambda b, m, v: (b, m, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, _LANES), lambda b, m, v: (b, m, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((block_q, n_pad), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _umbrella_kernel, k, 1 if drop_self else 0, rotate, return_dist,
            style,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, m_pad, _LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 2**20),
        interpret=interpret,
    )(valid.astype(jnp.int32), xyz_t, xyz_p, q)
    return out[:, :N, : G * C].reshape(B, N, G, C)
