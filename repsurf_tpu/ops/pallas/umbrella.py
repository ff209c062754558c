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
_GIDX_BIG = 3e7  # > any real index (python float: jnp scalars would be
# captured as pallas consts)


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
    # terms once per program and channel-concatenated to [N, 9]: one dot
    # instead of three (the 3..9 output lanes pad to 128 either way)
    P1, P2, P3 = _split3_kernel(xyzp_ref[0])
    Pcat = jnp.concatenate([P1, P2, P3], axis=1)

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
        cap = jnp.dot(selb, Pcat, preferred_element_type=jnp.float32)
        cxv = cap[:, 0:1] + cap[:, 3:4] + cap[:, 6:7]
        cyv = cap[:, 1:2] + cap[:, 4:5] + cap[:, 7:8]
        czv = cap[:, 2:3] + cap[:, 5:6] + cap[:, 8:9]
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
    # fori_loop, NOT unrolled: unrolling k rounds spills the register
    # allocator (measured 8.0 ms vs 6.8 at batch 64 x 1024, same lesson as
    # ops/pallas/knn.py)
    gx, gy, gz = jax.lax.fori_loop(0, k, body, (zeros, zeros, zeros))

    # center-relative coordinates (lanes >= g_count hold garbage, masked off)
    gx = gx - qx
    gy = gy - qy
    gz = gz - qz

    out_ref[0] = _fan_geometry_pack(
        rotate, return_dist, style, g_count, lane, gx, gy, gz
    )


def _fan_geometry_pack(rotate, return_dist, style, g_count, lane, gx, gy, gz):
    """Shared fan-geometry + channel-packing tail of both umbrella kernels.

    Takes center-relative fan coordinates in lanes 0..g_count-1 of
    [rows, 128] arrays and returns the packed [rows, 128] feature lanes
    (lane g*C + c), bit-identical to the XLA chain (see module docstring).
    """
    rows = gx.shape[0]
    names = _feature_order(style, return_dist)
    c_count = len(names)
    zeros = jnp.zeros((rows, _LANES), jnp.float32)

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
    return packed


def _umbrella_tq_kernel(
    k, skip, rotate, return_dist, style,
    valid_sref, xyzp_ref, q_ref, out_ref, d2_ref,
):
    """Transposed-layout umbrella kernel: queries on LANES, candidates on
    SUBLANES, fans on SUBLANES.

    The full-scan kernel (_umbrella_kernel) keeps queries on sublanes and
    candidates on lanes, so every extraction reduce is a cross-LANE reduce
    (shuffle-heavy on the VPU) and the fan-geometry phase runs on
    [block_q, 128] arrays in which only g_count of 128 lanes carry data
    (94% wasted VPU work).  Transposing fixes both:

      * the k extraction rounds reduce [n, bq] along SUBLANES — vreg-wise
        min chains with a 3-step tail instead of 7-step lane shuffles;
      * per-fan quantities live in [8, bq] — ONE vreg row-block per
        quantity, so the azimuth rank/sort/roll/repair chain is ~16x less
        VPU work than the lane-parallel form;
      * the coordinate capture flips to Pcat9 [9, n] @ sel [n, bq] — same
        exact 3-term bf16 trick, MXU-tiny.

    Output is packed TRANSPOSED as [G*C, bq] rows (row g*C + c) with one
    constant [GC, 8*C] one-hot MXU matmul; the caller transposes back
    (an [B, GC, N] -> [B, N, GC] XLA transpose, HBM-bandwidth trivial).

    Measured at batch 64 x 1024 (v5e): 6.0 ms (full) -> see PERF.md round-3
    table for this kernel.  Semantics are bit-identical to _umbrella_kernel
    (same formulas, same tie-breaks); exactness tests run both against the
    XLA chain.
    """
    n, bq = d2_ref.shape
    g_count = k - skip
    g_sub = _round_up(max(g_count, 1), 8)
    names = _feature_order(style, return_dist)
    c_count = len(names)
    b = pl.program_id(0)

    px = xyzp_ref[0, :, 0:1]  # [n, 1]
    py = xyzp_ref[0, :, 1:2]
    pz = xyzp_ref[0, :, 2:3]
    qx = q_ref[0, 0:1, :]  # [1, bq]
    qy = q_ref[0, 1:2, :]
    qz = q_ref[0, 2:3, :]
    p0x = px[0:1, 0:1]  # point 0: the kNN padding target
    p0y = py[0:1, 0:1]
    p0z = pz[0:1, 0:1]

    # [9, n] bf16 capture operand: exact 3-term split of the transposed
    # coordinates, concatenated on sublanes (one dot per round)
    xt = jnp.concatenate([px, py, pz], axis=1).T  # [3, n]
    T1, T2, T3 = _split3_kernel(xt)
    Pcat9 = jnp.concatenate([T1, T2, T3], axis=0)  # [9, n] bf16

    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, bq), 0)
    fani = jax.lax.broadcasted_iota(jnp.int32, (g_sub, bq), 0)

    d2 = (
        jnp.square(px - qx) + jnp.square(py - qy) + jnp.square(pz - qz)
    )
    d2_ref[:] = jnp.where(rowi < valid_sref[b], d2, BIG_DIST2)

    def body(r, carry):
        gx, gy, gz = carry
        d2 = d2_ref[:]
        dmin = jnp.min(d2, axis=0, keepdims=True)  # [1, bq]
        i = jnp.min(
            jnp.where(d2 == dmin, rowi, n), axis=0, keepdims=True
        )  # lowest-index tie-break, same as the lane kernel
        sel = rowi == i
        selb = sel.astype(jnp.bfloat16)
        cap = jnp.dot(Pcat9, selb, preferred_element_type=jnp.float32)
        cxv = cap[0:1] + cap[3:4] + cap[6:7]  # [1, bq]
        cyv = cap[1:2] + cap[4:5] + cap[7:8]
        czv = cap[2:3] + cap[5:6] + cap[8:9]
        pad = dmin >= BIG_DIST2
        cxv = jnp.where(pad, p0x, cxv)
        cyv = jnp.where(pad, p0y, cyv)
        czv = jnp.where(pad, p0z, czv)
        slot = fani == (r - skip)
        gx = jnp.where(slot, cxv, gx)
        gy = jnp.where(slot, cyv, gy)
        gz = jnp.where(slot, czv, gz)
        d2_ref[:] = jnp.where(sel, jnp.inf, d2)
        return gx, gy, gz

    zeros = jnp.zeros((g_sub, bq), jnp.float32)
    gx, gy, gz = jax.lax.fori_loop(0, k, body, (zeros, zeros, zeros))

    gx = gx - qx
    gy = gy - qy
    gz = gz - qz

    out_ref[0] = _fan_geometry_pack_tq(
        rotate, return_dist, style, g_count, fani, gx, gy, gz,
        out_dtype=out_ref.dtype,
    )


def _fan_geometry_pack_tq(
    rotate, return_dist, style, g_count, fani, gx, gy, gz,
    out_dtype=jnp.float32,
):
    """Fan geometry + packing with fans on SUBLANES ([g_sub, bq] arrays).

    Same formulas / tie-breaks / repair as _fan_geometry_pack (see there for
    the reference citations); returns packed [G*C, bq] rows (row g*C + c).

    out_dtype=bfloat16 emits the features ROUNDED TO bf16 straight from the
    pack matmul: the permutation has one non-zero (1.0) per output row, so
    bf16 operands reproduce exactly round(f32 value) — the same value XLA's
    default matmul precision would truncate the f32 features to in the first
    MLP layer anyway.  Downstream MXU consumers therefore see bit-identical
    operands while the [B, G*C, N] output, its transpose and every
    elementwise op in between move half the bytes and skip the convert
    fusion in front of the MLP (the round-3 tax, PERF.md).
    """
    g_sub, bq = gx.shape
    names = _feature_order(style, return_dist)
    c_count = len(names)
    zeros = jnp.zeros((g_sub, bq), jnp.float32)

    if rotate:
        R = FIXED_ROTATION_ROWS
        xr = R[0][0] * gx + R[1][0] * gy + R[2][0] * gz
        yr = R[0][1] * gx + R[1][1] * gy + R[2][1] * gz
    else:
        xr, yr = gx, gy
    xy0 = (xr == 0.0) & (yr == 0.0)
    phi = atan2(yr, jnp.where(xy0, 1.0, xr)) / (2 * _PI) + 0.5

    def row_get(arr, j):
        """Extract sublane j as [1, bq]."""
        return jnp.sum(jnp.where(fani == j, arr, 0), axis=0, keepdims=True)

    # stable ascending rank (== position under jnp.argsort)
    rank = jnp.zeros((g_sub, bq), jnp.int32)
    for j in range(g_count):
        pj = row_get(phi, j)
        beats = (pj < phi) | ((pj == phi) & (j < fani))
        rank = rank + beats.astype(jnp.int32)

    # scatter to sorted order
    sx = zeros
    sy = zeros
    sz = zeros
    for j in range(g_count):
        rj = row_get(rank, j)
        put = fani == rj
        sx = jnp.where(put, row_get(gx, j), sx)
        sy = jnp.where(put, row_get(gy, j), sy)
        sz = jnp.where(put, row_get(gz, j), sz)

    # successor fan: roll -1 along sublanes with the wrap at g_count
    wrap = fani == (g_count - 1)
    v2x = jnp.where(wrap, row_get(sx, 0), pltpu.roll(sx, g_sub - 1, axis=0))
    v2y = jnp.where(wrap, row_get(sy, 0), pltpu.roll(sy, g_sub - 1, axis=0))
    v2z = jnp.where(wrap, row_get(sz, 0), pltpu.roll(sz, g_sub - 1, axis=0))

    nx = sy * v2z - sz * v2y
    ny = sz * v2x - sx * v2z
    nz = sx * v2y - sy * v2x
    s2 = jnp.square(nx) + jnp.square(ny) + jnp.square(nz)
    deg = s2 == 0.0
    norm = jnp.sqrt(jnp.where(deg, 1.0, s2))
    ux = jnp.where(deg, 0.0, nx / norm)
    uy = jnp.where(deg, 0.0, ny / norm)
    uz = jnp.where(deg, 0.0, nz / norm)

    sign = jnp.where(row_get(ux, 0) > 0, 1.0, -1.0)
    ux = ux * sign
    uy = uy * sign
    uz = uz * sign

    cx = (sx + v2x) / 3.0
    cy = (sy + v2y) / 3.0
    cz = (sz + v2z) / 3.0

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

    ok = (~deg) & (fani < g_count)
    fo = jnp.min(jnp.where(ok, fani, g_sub), axis=0, keepdims=True)
    fo = jnp.where(fo >= g_sub, 0, fo)
    selfo = fani == fo
    badl = deg & (fani < g_count)

    def repaired(arr):
        repl = jnp.sum(jnp.where(selfo, arr, 0.0), axis=0, keepdims=True)
        return jnp.where(badl, repl, arr)

    cx, cy, cz = repaired(cx), repaired(cy), repaired(cz)
    ux, uy, uz = repaired(ux), repaired(uy), repaired(uz)
    if return_dist:
        posv = repaired(posv)

    chans = {
        "cx": cx, "cy": cy, "cz": cz,
        "rho": rho, "theta": theta, "phic": phic,
        "ux": ux, "uy": uy, "uz": uz,
    }
    if return_dist:
        chans["posv"] = posv

    # pack: allch rows c*g_sub + g; PERM [GC, c_count*g_sub] one-hot takes
    # row g*C + c from it.  One tiny MXU matmul; one non-zero per output
    # row, so HIGHEST precision reproduces f32 exactly (see the lane
    # kernel's pack for the rationale).
    allch = jnp.concatenate([chans[name] for name in names], axis=0)
    gc = g_count * c_count
    out_rows = _round_up(gc, 8)
    row_o = jax.lax.broadcasted_iota(jnp.int32, (out_rows, c_count * g_sub), 0)
    col_o = jax.lax.broadcasted_iota(jnp.int32, (out_rows, c_count * g_sub), 1)
    g_of = row_o // c_count
    c_of = row_o - g_of * c_count
    keep = (col_o == c_of * g_sub + g_of) & (row_o < gc) & (g_of < g_count)
    if out_dtype == jnp.bfloat16:
        # one 1.0 per row: 1.0(bf16) x round_bf16(value) accumulated in f32
        # == round_bf16(value) exactly (see docstring)
        return jnp.dot(
            keep.astype(jnp.bfloat16),
            allch.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    return jnp.dot(
        keep.astype(jnp.float32),
        allch,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _umbrella_tq(
    xyz, k, drop_self, rotate, return_dist, style, valid, block_q, interpret,
    out_dtype=jnp.float32,
):
    """Transposed-layout dispatch (see _umbrella_tq_kernel)."""
    B, N, _ = xyz.shape
    G = k - 1 if drop_self else k
    C = 10 if return_dist else 9
    gc = G * C
    out_rows = _round_up(gc, 8)
    if valid is None:
        valid = jnp.full((B,), N, jnp.int32)

    n_pad = max(_round_up(N, 8), 128)
    if block_q is None:
        block_q = 512 if N >= 512 else max(128, _round_up(N, 128))
    m_pad = _round_up(N, block_q)

    xyz_f = xyz.astype(jnp.float32)
    xyz_p = jnp.pad(xyz_f, ((0, 0), (0, n_pad - N), (0, 0)))  # [B, n_pad, 3]
    q_t = jnp.transpose(xyz_f, (0, 2, 1))  # [B, 3, N]
    q_t = jnp.pad(q_t, ((0, 0), (0, 0), (0, m_pad - N)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, m_pad // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, n_pad, 3), lambda b, m, v: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, block_q), lambda b, m, v: (b, 0, m),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, out_rows, block_q), lambda b, m, v: (b, 0, m),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((n_pad, block_q), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _umbrella_tq_kernel, k, 1 if drop_self else 0, rotate,
            return_dist, style,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, out_rows, m_pad), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 2**20),
        interpret=interpret,
    )(valid.astype(jnp.int32), xyz_p, q_t)
    return jnp.transpose(out[:, :gc, :N], (0, 2, 1)).reshape(B, N, G, C)


def _round_up(v, m):
    return -(-v // m) * m


_SLAB = 128  # points per x-slab == queries per block in the slab kernel


def _umbrella_slab_kernel(
    k, skip, rotate, return_dist, style, n_slabs,
    w0_ref, w1_ref, w2_ref, q_ref, out_ref,
):
    """Equal-count x-slab windowed umbrella kernel.

    Points and queries (the same cloud) are x-sorted on the XLA side and cut
    into n_slabs slabs of exactly _SLAB points; block s processes the
    queries of slab s against the 3-slab window clip(s-1, 0, n_slabs-3)..+2
    — 3 * _SLAB candidate lanes instead of N.  Exactness is guarded per
    query: the k-th neighbor distance must not reach past the window's
    x-extent (emitted in spare output lanes; the caller re-solves failures
    through the XLA chain).  Window operands arrive as three overlapping
    (1, 4, _SLAB) blocks of the x-sorted [B, 4, N] point array (rows x, y,
    z, original index or -1 for invalid), auto-pipelined by Pallas — no
    manual DMA.
    """
    rows = q_ref.shape[1]
    g_count = k - skip
    names = _feature_order(style, return_dist)
    c_count = len(names)
    gc = g_count * c_count
    s = pl.program_id(1)
    c0 = jnp.clip(s - 1, 0, n_slabs - 3)

    px = jnp.concatenate(
        [w0_ref[0, 0:1, :], w1_ref[0, 0:1, :], w2_ref[0, 0:1, :]], axis=1
    )  # [1, 3*_SLAB]
    py = jnp.concatenate(
        [w0_ref[0, 1:2, :], w1_ref[0, 1:2, :], w2_ref[0, 1:2, :]], axis=1
    )
    pz = jnp.concatenate(
        [w0_ref[0, 2:3, :], w1_ref[0, 2:3, :], w2_ref[0, 2:3, :]], axis=1
    )
    pg = jnp.concatenate(
        [w0_ref[0, 3:4, :], w1_ref[0, 3:4, :], w2_ref[0, 3:4, :]], axis=1
    )
    w = px.shape[1]

    qx = q_ref[0, :, 0:1]  # [rows, 1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    valid_w = pg >= 0.0
    d2 = jnp.square(qx - px) + jnp.square(qy - py) + jnp.square(qz - pz)
    d2 = jnp.where(valid_w, d2, BIG_DIST2)

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    zeros = jnp.zeros((rows, _LANES), jnp.float32)

    # kNN padding target: the sample's point 0 = the valid point with the
    # smallest original index anywhere in the cloud.  Padded slots only
    # occur when valid < k, where the guard flags every query anyway and
    # the XLA fallback recomputes them — so any placeholder works; use the
    # window's first lane.
    p0x = px[0:1, 0:1]
    p0y = py[0:1, 0:1]
    p0z = pz[0:1, 0:1]

    def body(r, carry):
        gx, gy, gz, d2, kth = carry
        dmin = jnp.min(d2, axis=1)
        # tie-break on smallest ORIGINAL index: window lane order is
        # x-sorted, not index order
        gi = jnp.min(jnp.where(d2 == dmin[:, None], pg, _GIDX_BIG), axis=1)
        sel = (d2 == dmin[:, None]) & (pg == gi[:, None])
        pad = (dmin >= BIG_DIST2)[:, None]
        cxv = jnp.sum(jnp.where(sel, px, 0.0), axis=1, keepdims=True)
        cyv = jnp.sum(jnp.where(sel, py, 0.0), axis=1, keepdims=True)
        czv = jnp.sum(jnp.where(sel, pz, 0.0), axis=1, keepdims=True)
        cxv = jnp.where(pad, p0x, cxv)
        cyv = jnp.where(pad, p0y, cyv)
        czv = jnp.where(pad, p0z, czv)
        slot = lane == (r - skip)
        gx = jnp.where(slot, cxv, gx)
        gy = jnp.where(slot, cyv, gy)
        gz = jnp.where(slot, czv, gz)
        kth = jnp.minimum(dmin, BIG_DIST2)  # final round's min = kth d2
        return gx, gy, gz, jnp.where(sel, jnp.inf, d2), kth

    gx, gy, gz, _, kth_d2 = jax.lax.fori_loop(
        0, k, body, (zeros, zeros, zeros, d2, jnp.zeros((rows,), jnp.float32))
    )

    gx = gx - qx
    gy = gy - qy
    gz = gz - qz

    packed = _fan_geometry_pack(
        rotate, return_dist, style, g_count, lane, gx, gy, gz
    )

    # -- exactness guard lanes -----------------------------------------------
    # Margin to the nearest x-excluded point: points left of the window
    # exist iff c0 > 0; right of it iff c0 < n_slabs-3 AND the window's last
    # lane is a valid point (invalid points sort last, so an invalid tail
    # means nothing real lies beyond).
    wlo = px[0:1, 0:1]
    whi = px[0:1, w - 1 : w]
    right_valid = pg[0:1, w - 1 : w] >= 0.0
    ml = jnp.where(c0 > 0, qx - wlo, BIG_DIST2)
    mr = jnp.where((c0 < n_slabs - 3) & right_valid, whi - qx, BIG_DIST2)
    margin = jnp.maximum(jnp.minimum(ml, mr), 0.0)  # [rows, 1]
    packed = jnp.where(lane == gc, kth_d2[:, None], packed)
    packed = jnp.where(lane == gc + 1, margin, packed)
    out_ref[0] = packed


def _xla_umbrella_for_queries(
    xyz, queries, k, drop_self, rotate, return_dist, style, valid, interpret
):
    """XLA-chain umbrella features for an arbitrary query subset.

    The slab kernel's exactness fallback: distances/ties via knn_pallas
    (direct-difference form — the same arithmetic the slab kernel uses, so
    re-solved queries agree bit-for-bit when the window WAS sufficient) and
    the geometry via the differentiable XLA composition.  No random
    inversion — the caller applies the per-sample sign outside, as with the
    kernel output.
    """
    from ...geometry.polar import xyz2sphere
    from ...geometry.surface import (
        cal_center,
        cal_const,
        cal_normal,
        repair_invalid_group,
    )
    from ...geometry.umbrella import fixed_rotation_matrix, group_by_umbrella_idx
    from .knn import knn_pallas

    idx, _ = knn_pallas(k, xyz, queries, valid=valid, interpret=interpret)
    if drop_self:
        idx = idx[:, :, 1:]
    rot = fixed_rotation_matrix() if rotate else None
    fans = group_by_umbrella_idx(xyz, queries, idx, sort_rotation=rot)
    normal, bad = cal_normal(fans, random_inv_sign=None, is_group=True)
    t_center = cal_center(fans)
    polar = xyz2sphere(t_center)
    if return_dist:
        pos = cal_const(normal, t_center)
        normal, t_center, pos = repair_invalid_group(bad, normal, t_center, pos)
        if style == "seg":
            return jnp.concatenate([polar, normal, pos, t_center], axis=-1)
        return jnp.concatenate([t_center, polar, normal, pos], axis=-1)
    normal, t_center = repair_invalid_group(bad, normal, t_center)
    return jnp.concatenate([t_center, polar, normal], axis=-1)


def _umbrella_slab(
    xyz, k, drop_self, rotate, return_dist, style, valid, interpret
):
    """Slab-windowed umbrella features (see _umbrella_slab_kernel)."""
    from ..gather import index_points

    B, N, _ = xyz.shape
    G = k - 1 if drop_self else k
    C = 10 if return_dist else 9
    gc = G * C
    n_slabs = N // _SLAB
    if valid is None:
        valid = jnp.full((B,), N, jnp.int32)
    valid = valid.astype(jnp.int32)
    xyz_f = jax.lax.stop_gradient(xyz.astype(jnp.float32))

    def prep(x, nv):
        ok = jnp.arange(N) < nv
        # x-sort with invalid points last; stable, so equal keys keep
        # original index order
        key = jnp.where(ok, x[:, 0], jnp.inf)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        xs = x[order]
        pgv = jnp.where(order < nv, order, -1).astype(jnp.float32)
        p4 = jnp.concatenate([xs.T, pgv[None, :]], axis=0)  # [4, N]
        return p4, xs, order

    p4, xs, order = jax.vmap(prep)(xyz_f, valid)

    def cmap(b, s):
        return (b, 0, jnp.clip(s - 1, 0, n_slabs - 3))

    out = pl.pallas_call(
        functools.partial(
            _umbrella_slab_kernel, k, 1 if drop_self else 0, rotate,
            return_dist, style, n_slabs,
        ),
        grid=(B, n_slabs),
        in_specs=[
            pl.BlockSpec(
                (1, 4, _SLAB), cmap, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 4, _SLAB),
                lambda b, s: (b, 0, jnp.clip(s - 1, 0, n_slabs - 3) + 1),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, _SLAB),
                lambda b, s: (b, 0, jnp.clip(s - 1, 0, n_slabs - 3) + 2),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _SLAB, 3), lambda b, s: (b, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _SLAB, _LANES), lambda b, s: (b, s, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, _LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(p4, p4, p4, xs)

    # reorder features + guard lanes back to original point order in ONE
    # MXU one-hot gather (output row j lives at sorted slot inv[j])
    inv = jnp.argsort(order, axis=-1).astype(jnp.int32)
    outp = index_points(out[:, :, : gc + 2], inv)
    feat = outp[..., :gc].reshape(B, N, G, C)
    kth_d2 = outp[..., gc]
    margin = outp[..., gc + 1]
    point_ok = jnp.arange(N)[None, :] < valid[:, None]
    bad = (
        (kth_d2 >= jnp.square(0.999 * margin)) | (kth_d2 >= BIG_DIST2)
    ) & point_ok

    n_bad_max = jnp.max(jnp.sum(bad.astype(jnp.int32), axis=1))

    def make_resolver(size):
        def run(f):
            p = jax.vmap(
                lambda b_: jnp.nonzero(b_, size=size, fill_value=N)[0]
            )(bad).astype(jnp.int32)
            q_bad = index_points(xyz_f, jnp.clip(p, 0, N - 1))
            fb = _xla_umbrella_for_queries(
                xyz_f, q_bad, k, drop_self, rotate, return_dist, style,
                valid, interpret,
            )
            return jax.vmap(
                lambda f_, p_, v_: f_.at[p_].set(v_, mode="drop")
            )(f, p, fb)

        return run

    tiers = sorted({min(64, N), min(256, N), N})
    branches = [lambda f: f] + [make_resolver(s) for s in tiers]
    sel = jnp.searchsorted(
        jnp.asarray([1] + [t + 1 for t in tiers[:-1]]), n_bad_max,
        side="right",
    )
    return jax.lax.switch(sel, branches, feat)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "drop_self", "rotate", "return_dist", "style", "block_q",
        "interpret", "impl", "out_dtype",
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
    impl="auto",
    out_dtype=jnp.float32,
):
    """Fused umbrella geometry: points -> per-fan surface features.

    Equivalent to group_by_umbrella + cal_normal(sign-fix, no random_inv) +
    cal_center + xyz2sphere + cal_const + repair_invalid_group + the style's
    channel concat, in one kernel.  Dispatches to the slab-windowed kernel
    (x-sorted equal-count windows, ~2.7x less extraction work, guarded
    exact) when shapes allow, else the full-scan kernel.

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
      impl: 'auto' | 'slab' | 'full'.
      out_dtype: float32, or bfloat16 ('tq' impl only) to emit the features
        pre-rounded to bf16 — bit-identical operands for any default-
        precision MXU consumer at half the HBM bytes (see
        _fan_geometry_pack_tq).

    Returns:
      feat: [B, N, G, C] out_dtype, C = 10 (return_dist) or 9.
    """
    B, N, _ = xyz.shape
    G = k - 1 if drop_self else k
    C = 10 if return_dist else 9
    if impl == "auto" and G <= 16:
        # queries-on-lanes kernel: cheaper sublane reduces + vreg-dense fan
        # geometry (see _umbrella_tq_kernel docstring; round-3 PERF table)
        impl = "tq"
    if impl == "tq":
        return _umbrella_tq(
            xyz, k, drop_self, rotate, return_dist, style, valid, block_q,
            interpret, out_dtype=out_dtype,
        )
    if out_dtype != jnp.float32:
        raise ValueError("out_dtype=bfloat16 is only supported by the 'tq' impl")
    if G * C > _LANES:
        raise ValueError(f"umbrella fans*channels {G * C} exceed {_LANES} lanes")
    if impl == "auto":
        # The slab route is a preserved, measured DEAD END at object scale:
        # a 1-D x-window of +-128 sorted points is narrower than the k=9
        # neighborhood radius for both volumetric clouds (gaussian batch:
        # ~50% guard failures) and FPS-sampled surface objects (16.5%
        # failures measured on synthetic_object data) — the tiered XLA
        # fallback then dominates (19.1 ms vs the full kernel's 7.1 ms at
        # batch 64 x 1024 on v5e).  A 128-lane DMA/BlockSpec granularity
        # floor blocks finer 2-D/3-D windows at N~1024 (9 cells x 128
        # lanes >= N already).  It remains exact and selectable for
        # experiments on flatter data.
        impl = "full"
    if impl == "slab":
        return _umbrella_slab(
            xyz, k, drop_self, rotate, return_dist, style, valid, interpret
        )
    if valid is None:
        valid = jnp.full((B,), N, jnp.int32)

    n_pad = max(_round_up(N, 128), 256)
    if block_q is None:
        # d2 scratch + ~4 live [rows, n] temporaries within ~80 MB VMEM;
        # capped at 256: measured 6.0 ms vs 7.2 (512) / 8.2 (128) at
        # batch 64 x 1024 — bigger blocks exceed the sweet spot between
        # per-block overhead amortization and VMEM/register pressure
        block_q = max(8, min(256, (80 * 2**20 // (n_pad * 4 * 4)) // 8 * 8))
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
