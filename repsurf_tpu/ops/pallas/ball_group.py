"""Fused ball-query + grouping Pallas kernel.

The XLA ``ball_group`` route (ops/neighbors.py) fuses the ball query
into the gather's one-hot build but streams its big intermediates
through HBM: the [B, M, N] distance/rank tensors and the [B, M, S, N]
slot one-hot that feeds the capture matmul.  This kernel runs the whole
chain per query block in VMEM; whether that wins depends on how much of
the capture matmul's 128-lane output tile the channels fill (measured on
v5e, device time via on-device scalar reduction — NEVER by reading the
grouped tensor back through the axon tunnel, which swamps kernel time):

  sa1 scale (64 x 512q x 1024, S=32, C=13 -> 39/128 lanes):
      pallas 3.8 ms vs XLA 3.3 ms  -> XLA kept
  sa2 scale (64 x 128q x 512, S=64, C=141 -> 423/512 lanes):
      pallas 3.7 ms vs XLA 4.7 ms  -> pallas routed

ops/neighbors.ball_group routes here when 3C fills >= half the padded
capture lanes (C >= 43) and the cloud fits VMEM (N <= 2048).

  * distances [qblk, N] -> in-radius mask -> hit ranks via ONE MXU matmul
    against a resident triangular 0/1 matrix (exact: 0/1 operands in bf16,
    f32 accumulation below 2^24);
  * slot selection masks for ALL slots at once as a [qblk*S, N] compare
    (lane order IS index order — no sorting, no tie machinery), consumed
    directly by ONE capture matmul [qblk*S, N] x [N, 3C] against the
    channel tensor pre-split into three exact bf16 terms
    (ops/gather._split_bf16_terms), f32-accumulated and term-summed —
    bit-identical to the XLA route's gather;
  * reference semantics preserved exactly: first S in-radius points in
    index order, short balls padded with the first hit, empty balls
    gather point 0 (the CUDA kernel's idx=0 degenerate case,
    classification/modules/pointops/src/ballquery/ballquery_cuda_kernel.cu:47-80).

Gradients: selection is non-differentiable (comparisons), values flow
only through the capture contraction — the custom_vjp backward recomputes
the slot one-hot in XLA and contracts it with the cotangent, the same
transpose the XLA route's autodiff produces.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .math import acos, atan2

_PI = float(jnp.pi)


def _round_up(v, m):
    return -(-v // m) * m


def _ball_kernel(
    r2, nsample, c_all, n_terms, mm_dtype,
    xyz_ref, tril_ref, p_ref, q_ref, out_ref,
):
    """One query block: mask -> rank -> slot one-hots -> capture.

    xyz_ref [1, 4, n]: rows x, y, z, valid (1.0 real / 0.0 padding).
    tril_ref [n, n] bf16: lower-triangular 0/1 (col <= row ... transposed
      so that rank = within @ tril is an INCLUSIVE prefix count).
    p_ref [1, n, cp] bf16: channel tensor, term-concatenated bf16 splits.
    q_ref [1, qblk, 3]: query centers.
    out_ref [1, qblk, S, c_pad] f32: grouped channels per slot.
    """
    rows = q_ref.shape[1]
    n = xyz_ref.shape[2]
    cp = p_ref.shape[2]

    px = xyz_ref[0, 0:1, :]
    py = xyz_ref[0, 1:2, :]
    pz = xyz_ref[0, 2:3, :]
    vm = xyz_ref[0, 3:4, :]
    qx = q_ref[0, :, 0:1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    d2 = jnp.square(qx - px) + jnp.square(qy - py) + jnp.square(qz - pz)
    within = (d2 <= r2) & (vm > 0.0)  # [rows, n]
    wb = within.astype(mm_dtype)

    # inclusive prefix count of hits along the index order (== CUDA scan
    # order); exact: 0/1 products, f32 accumulation, counts < 2^24
    rank = jnp.dot(wb, tril_ref[...], preferred_element_type=jnp.float32)
    count = jnp.sum(within.astype(jnp.float32), axis=1, keepdims=True)
    rankw = jnp.where(within, rank, 0.0)  # rank 0 never matches a slot

    # all slots in one compare: slot s (1-based) takes hit rank s while
    # hits remain, else rank 1 (pad with first hit)
    slots = (
        1.0
        + jax.lax.broadcasted_iota(jnp.int32, (1, nsample, 1), 1).astype(
            jnp.float32
        )
    )  # [1, S, 1] (Mosaic iota is integer-only)
    tgt = jnp.where(slots <= count[:, :, None], slots, 1.0)  # [rows, S, 1]
    sel3 = (rankw[:, None, :] == tgt).astype(mm_dtype)  # [rows, S, n]
    sel = sel3.reshape(rows * nsample, n)

    cap = jnp.dot(sel, p_ref[0], preferred_element_type=jnp.float32)
    val = cap[:, :c_all]
    for t in range(1, n_terms):
        val = val + cap[:, t * c_all : (t + 1) * c_all]

    # empty balls gather point 0 (always lane 0: lane order is index order)
    p0 = p_ref[0, 0:1, :]
    p0v = p0[:, :c_all].astype(jnp.float32)
    for t in range(1, n_terms):
        p0v = p0v + p0[:, t * c_all : (t + 1) * c_all].astype(jnp.float32)
    val = val.reshape(rows, nsample, c_all)
    val = jnp.where(count[:, :, None] == 0.0, p0v[None], val)

    c_pad = out_ref.shape[3]
    if c_pad != c_all:
        val = jnp.pad(val, ((0, 0), (0, 0), (0, c_pad - c_all)))
    out_ref[0] = val


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "qblk", "interpret")
)
def _ball_group_core(radius, nsample, xyz, new_xyz, tcat, valid,
                     qblk=None, interpret=False):
    from ..gather import _split_bf16_terms

    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    C = tcat.shape[-1]
    n_pad = _round_up(N, 128)
    if qblk is None:
        # the [qblk*S, n_pad] selection block is the VMEM heavyweight;
        # keep it ~<=12 MB (plus capture output, tril, P — ~100 MB limit)
        fit = (12 * 2**20) // (nsample * n_pad * 2) // 8 * 8
        qblk = max(8, min(128, _round_up(M, 8), fit))
    m_pad = _round_up(M, qblk)

    xyz_f = jax.lax.stop_gradient(xyz.astype(jnp.float32))
    q_f = jax.lax.stop_gradient(new_xyz.astype(jnp.float32))

    vm = (
        jnp.ones((B, N), jnp.float32)
        if valid is None
        else (jnp.arange(N)[None, :] < valid[:, None]).astype(jnp.float32)
    )
    x4 = jnp.concatenate([jnp.transpose(xyz_f, (0, 2, 1)), vm[:, None]], 1)
    x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, n_pad - N)))
    q = jnp.pad(q_f, ((0, 0), (0, m_pad - M), (0, 0)))

    # bf16 split terms only on real TPU hardware: CPU (tests / interpret
    # mode) emulates bf16 matmuls scalar-by-scalar AND the CPU XLA route
    # contracts in f32, so a single f32 term is both fast and bit-equal
    on_tpu = jax.default_backend() == "tpu" and not interpret
    mm_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu and tcat.dtype == jnp.float32:
        terms = _split_bf16_terms(tcat)
    else:
        terms = [tcat.astype(mm_dtype)]
    p = jnp.concatenate(terms, axis=-1) if len(terms) > 1 else terms[0]
    cp = _round_up(p.shape[-1], 128)
    p = jnp.pad(p, ((0, 0), (0, n_pad - N), (0, cp - p.shape[-1])))

    # transposed: rank = within @ tril must count hits at LOWER OR EQUAL
    # index, so tril[i, j] = (i <= j)
    ii = jnp.arange(n_pad, dtype=jnp.int32)
    tril = (ii[:, None] <= ii[None, :]).astype(mm_dtype)

    c_pad = C if C % 128 == 0 else _round_up(C, 8)
    out = pl.pallas_call(
        functools.partial(
            _ball_kernel, float(radius) ** 2, nsample, C, len(terms),
            mm_dtype,
        ),
        grid=(B, m_pad // qblk),
        in_specs=[
            pl.BlockSpec(
                (1, 4, n_pad), lambda b, m: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_pad, n_pad), lambda b, m: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_pad, cp), lambda b, m: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, qblk, 3), lambda b, m: (b, m, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, qblk, nsample, c_pad), lambda b, m: (b, m, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, m_pad, nsample, c_pad), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x4, tril, p, q)
    return out[:, :M, :, :C]


def _ball_feat_kernel(
    r2, nsample, c_all, n_terms, mm_dtype, return_polar, out_dtype,
    n_cap_terms,
    xyz_ref, tril_ref, trilt_ref, pcatt_ref, p_ref, q_ref,
    pos_ref, feat_ref,
):
    """Split-output ball kernel: the CD pos branch (center-relative
    coordinates + optional xyz2sphere) computed PLANAR-TRANSPOSED in
    VMEM, the trailing channels captured channel-minor as before.

    Two failed designs are worth recording (both bit-correct, both slow):
      * rel/polar on the [rows, S, 1] channel-minor slices in-kernel —
        every broadcast wastes 127/128 lanes (1.5 -> 5.1 ms at sa2);
      * rel/polar in XLA on the emitted [B, M, S, 3] tensor — XLA
        canonicalizes the per-channel planes back to [.., 1]-minor layouts
        and the atan2/acos software expansions run at 1/128 lane occupancy
        (9+ ms of fusions at sa1+sa2 scale, batch 64).

    The fix is a second, TRANSPOSED selection pipeline for the 3 pos
    channels only: everything lives as [n, rows] / [*, S*rows] arrays
    (slot-major columns), so the polar chain runs on [1, S*rows]
    full-lane vectors and costs ~nothing.  The per-slot one-hot is built
    with pltpu.repeat(rankT, S) == flat target rank, and the coordinate
    capture is one [16, n] x [n, S*rows] MXU dot against the exact
    3-term bf16 split of the coordinates.  Output pos_ref[1, 8, S*rows]
    rows (rx, ry, rz[, rho, theta, phi]); the caller de-interleaves with
    one cheap XLA transpose.

    The trailing channels keep the proven channel-minor capture
    (_ball_kernel) and are emitted in out_dtype: bf16 output reproduces
    exactly the f32->bf16 convert XLA inserts in front of the MXU at
    default precision, so downstream matmuls see bit-identical operands
    while the big [B, M, S, C] tensor crosses HBM at half width and none
    of the slice/convert/layout fusions around it exist at all (they were
    ~6.7 ms of the 16 ms classification forward at batch 64).
    """
    rows = q_ref.shape[1]
    n = xyz_ref.shape[2]

    px = xyz_ref[0, 0:1, :]
    py = xyz_ref[0, 1:2, :]
    pz = xyz_ref[0, 2:3, :]
    vm = xyz_ref[0, 3:4, :]
    qx = q_ref[0, :, 0:1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    d2 = jnp.square(qx - px) + jnp.square(qy - py) + jnp.square(qz - pz)
    within = (d2 <= r2) & (vm > 0.0)
    wb = within.astype(mm_dtype)

    rank = jnp.dot(wb, tril_ref[...], preferred_element_type=jnp.float32)
    count = jnp.sum(within.astype(jnp.float32), axis=1, keepdims=True)
    rankw = jnp.where(within, rank, 0.0)

    slots = (
        1.0
        + jax.lax.broadcasted_iota(jnp.int32, (1, nsample, 1), 1).astype(
            jnp.float32
        )
    )
    tgt = jnp.where(slots <= count[:, :, None], slots, 1.0)
    sel3 = (rankw[:, None, :] == tgt).astype(mm_dtype)
    sel = sel3.reshape(rows * nsample, n)

    cap = jnp.dot(sel, p_ref[0], preferred_element_type=jnp.float32)
    val = cap[:, :c_all]
    for t in range(1, n_terms):
        val = val + cap[:, t * c_all : (t + 1) * c_all]

    p0 = p_ref[0, 0:1, :]
    p0v = p0[:, :c_all].astype(jnp.float32)
    for t in range(1, n_terms):
        p0v = p0v + p0[:, t * c_all : (t + 1) * c_all].astype(jnp.float32)
    val = val.reshape(rows, nsample, c_all)
    val = jnp.where(count[:, :, None] == 0.0, p0v[None], val)

    rest = val[..., 3:]
    fc = feat_ref.shape[3]
    if fc != rest.shape[-1]:
        rest = jnp.pad(rest, ((0, 0), (0, 0), (0, fc - rest.shape[-1])))
    feat_ref[0] = rest.astype(out_dtype)

    # ---- transposed planar pos pipeline --------------------------------
    # the [n, rows] chain is recomputed directly rather than transposing
    # d2/rank: a [rows, n] -> [n, rows] relayout costs more than the
    # (tiny) recomputed arithmetic
    pxt = px.reshape(n, 1)
    pyt = py.reshape(n, 1)
    pzt = pz.reshape(n, 1)
    vmt = vm.reshape(n, 1)
    qxt = qx.reshape(1, rows)
    qyt = qy.reshape(1, rows)
    qzt = qz.reshape(1, rows)

    d2T = (
        jnp.square(pxt - qxt) + jnp.square(pyt - qyt) + jnp.square(pzt - qzt)
    )
    withinT = (d2T <= r2) & (vmt > 0.0)  # [n, rows]
    rankT = jnp.dot(
        trilt_ref[...], withinT.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
    rankwT = jnp.where(withinT, rankT, 0.0)
    countT = jnp.sum(withinT.astype(jnp.float32), axis=0, keepdims=True)

    slot_col = (
        1.0
        + jax.lax.broadcasted_iota(jnp.int32, (nsample, rows), 0).astype(
            jnp.float32
        )
    )
    tgtT = jnp.where(slot_col <= countT, slot_col, 1.0)  # [S, rows]
    tgt_flat = tgtT.reshape(1, nsample * rows)  # col = s*rows + q

    rank_rep = pltpu.repeat(rankwT, nsample, axis=1)  # [n, S*rows]
    selT = (rank_rep == tgt_flat).astype(mm_dtype)

    capT = jnp.dot(
        pcatt_ref[0], selT, preferred_element_type=jnp.float32
    )  # [16, S*rows]; rows t*3+c of the exact bf16 split
    capx = capT[0:1]
    capy = capT[1:2]
    capz = capT[2:3]
    for t in range(1, n_cap_terms):
        capx = capx + capT[t * 3 : t * 3 + 1]
        capy = capy + capT[t * 3 + 1 : t * 3 + 2]
        capz = capz + capT[t * 3 + 2 : t * 3 + 3]

    empty_flat = pltpu.repeat(countT == 0.0, nsample, axis=1)
    p0x = pxt[0:1, 0:1]
    p0y = pyt[0:1, 0:1]
    p0z = pzt[0:1, 0:1]
    capx = jnp.where(empty_flat, p0x, capx)
    capy = jnp.where(empty_flat, p0y, capy)
    capz = jnp.where(empty_flat, p0z, capz)

    qx_flat = pltpu.repeat(qxt, nsample, axis=1)
    qy_flat = pltpu.repeat(qyt, nsample, axis=1)
    qz_flat = pltpu.repeat(qzt, nsample, axis=1)
    rx = capx - qx_flat
    ry = capy - qy_flat
    rz = capz - qz_flat

    chans = [rx, ry, rz]
    if return_polar:
        # xyz2sphere(normalize=True), geometry/polar.py:14-44 formulas
        s2 = jnp.square(rx) + jnp.square(ry) + jnp.square(rz)
        zero = s2 == 0.0
        rho = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, s2)))
        u = jnp.clip(rz / jnp.where(zero, 1.0, rho), -1.0, 1.0)
        at_pole = jnp.abs(u) >= 1.0
        theta = acos(jnp.where(at_pole, 0.0, u))
        theta = jnp.where(at_pole, jnp.where(u > 0, 0.0, _PI), theta)
        theta = jnp.where(zero, 0.0, theta) / _PI
        xy0 = (rx == 0.0) & (ry == 0.0)
        phi = atan2(ry, jnp.where(xy0, 1.0, rx)) / (2 * _PI) + 0.5
        chans += [rho, theta, phi]

    posT = jnp.concatenate(
        chans + [jnp.zeros_like(rx)] * (pos_ref.shape[1] - len(chans)),
        axis=0,
    )
    pos_ref[0] = posT.astype(pos_ref.dtype)


def _ball_feat_t_kernel(
    r2, nsample, c_all, n_terms, mm_dtype, return_polar, out_dtype,
    xyz_ref, trilt_ref, pt_ref, q_ref, pos_ref, featt_ref,
):
    """Fully transposed feature ball kernel (small channel counts).

    One selection pipeline, entirely in the [n, rows] / [*, S*rows]
    transposed layout, and ONE capture matmul for every channel:
    capT [cp_t, S*rows] = pt [cp_t, n] @ selT [n, S*rows].  With channels
    on SUBLANES the capture pads c_all*terms to 16 rows instead of 128
    lanes — at sa1 scale (c_all = 23, 3 terms -> 69/72 rows vs 69/128
    lanes) this plus dropping the second (channel-minor) selection
    pipeline roughly halves the kernel.  feat comes out TRANSPOSED
    [fc, S*rows]; the caller de-interleaves with one dense XLA transpose
    (cheap at small fc — which is why _ball_feat_core routes here only
    when c_all is small).  Semantics identical to _ball_feat_kernel.
    """
    rows = q_ref.shape[1]
    n = xyz_ref.shape[2]

    pxt = xyz_ref[0, 0:1, :].reshape(n, 1)
    pyt = xyz_ref[0, 1:2, :].reshape(n, 1)
    pzt = xyz_ref[0, 2:3, :].reshape(n, 1)
    vmt = xyz_ref[0, 3:4, :].reshape(n, 1)
    qxt = q_ref[0, :, 0:1].reshape(1, rows)
    qyt = q_ref[0, :, 1:2].reshape(1, rows)
    qzt = q_ref[0, :, 2:3].reshape(1, rows)

    d2T = (
        jnp.square(pxt - qxt) + jnp.square(pyt - qyt) + jnp.square(pzt - qzt)
    )
    withinT = (d2T <= r2) & (vmt > 0.0)
    rankT = jnp.dot(
        trilt_ref[...], withinT.astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
    rankwT = jnp.where(withinT, rankT, 0.0)
    countT = jnp.sum(withinT.astype(jnp.float32), axis=0, keepdims=True)

    slot_col = (
        1.0
        + jax.lax.broadcasted_iota(jnp.int32, (nsample, rows), 0).astype(
            jnp.float32
        )
    )
    tgtT = jnp.where(slot_col <= countT, slot_col, 1.0)
    tgt_flat = tgtT.reshape(1, nsample * rows)

    rank_rep = pltpu.repeat(rankwT, nsample, axis=1)
    selT = (rank_rep == tgt_flat).astype(mm_dtype)

    capT = jnp.dot(pt_ref[0], selT, preferred_element_type=jnp.float32)
    valT = capT[:c_all]
    for t in range(1, n_terms):
        valT = valT + capT[t * c_all : (t + 1) * c_all]

    # empty balls gather point 0 (reference idx-0 degenerate case)
    p0T = pt_ref[0, :c_all, 0:1].astype(jnp.float32)
    for t in range(1, n_terms):
        p0T = p0T + pt_ref[0, t * c_all : (t + 1) * c_all, 0:1].astype(
            jnp.float32
        )
    empty_flat = pltpu.repeat(countT == 0.0, nsample, axis=1)
    valT = jnp.where(empty_flat, p0T, valT)

    fc = featt_ref.shape[1]
    rest = valT[3:]
    if fc != rest.shape[0]:
        rest = jnp.concatenate(
            [rest, jnp.zeros((fc - rest.shape[0], rest.shape[1]), rest.dtype)],
            axis=0,
        )
    featt_ref[0] = rest.astype(out_dtype)

    qx_flat = pltpu.repeat(qxt, nsample, axis=1)
    qy_flat = pltpu.repeat(qyt, nsample, axis=1)
    qz_flat = pltpu.repeat(qzt, nsample, axis=1)
    rx = valT[0:1] - qx_flat
    ry = valT[1:2] - qy_flat
    rz = valT[2:3] - qz_flat

    chans = [rx, ry, rz]
    if return_polar:
        s2 = jnp.square(rx) + jnp.square(ry) + jnp.square(rz)
        zero = s2 == 0.0
        rho = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, s2)))
        u = jnp.clip(rz / jnp.where(zero, 1.0, rho), -1.0, 1.0)
        at_pole = jnp.abs(u) >= 1.0
        theta = acos(jnp.where(at_pole, 0.0, u))
        theta = jnp.where(at_pole, jnp.where(u > 0, 0.0, _PI), theta)
        theta = jnp.where(zero, 0.0, theta) / _PI
        xy0 = (rx == 0.0) & (ry == 0.0)
        phi = atan2(ry, jnp.where(xy0, 1.0, rx)) / (2 * _PI) + 0.5
        chans += [rho, theta, phi]

    posT = jnp.concatenate(
        chans + [jnp.zeros_like(rx)] * (pos_ref.shape[1] - len(chans)),
        axis=0,
    )
    pos_ref[0] = posT.astype(pos_ref.dtype)


# transposed-feat route: below this channel count the one-capture
# transposed kernel + a small XLA de-interleave wins (see kernel doc)
_FEAT_T_MAX_C = 48


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "nsample", "return_polar", "out_dtype", "qblk", "interpret"
    ),
)
def _ball_feat_core(
    radius, nsample, xyz, new_xyz, tcat, valid,
    return_polar=False, out_dtype=jnp.float32, qblk=None, interpret=False,
):
    from ..gather import _split_bf16_terms

    # the custom_vjp path reaches here without the interpret flag; fall
    # back to interpreter mode off-TPU so autodiff tests run on CPU
    interpret = interpret or jax.default_backend() != "tpu"

    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    C = tcat.shape[-1]
    n_pad = _round_up(N, 128)
    if qblk is None:
        fit = (12 * 2**20) // (nsample * n_pad * 2) // 8 * 8
        qblk = max(8, min(128, _round_up(M, 8), fit))
    m_pad = _round_up(M, qblk)

    xyz_f = jax.lax.stop_gradient(xyz.astype(jnp.float32))
    q_f = jax.lax.stop_gradient(new_xyz.astype(jnp.float32))

    vm = (
        jnp.ones((B, N), jnp.float32)
        if valid is None
        else (jnp.arange(N)[None, :] < valid[:, None]).astype(jnp.float32)
    )
    x4 = jnp.concatenate([jnp.transpose(xyz_f, (0, 2, 1)), vm[:, None]], 1)
    x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, n_pad - N)))
    q = jnp.pad(q_f, ((0, 0), (0, m_pad - M), (0, 0)))

    on_tpu = jax.default_backend() == "tpu" and not interpret
    mm_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu and tcat.dtype == jnp.float32:
        terms = _split_bf16_terms(tcat)
    else:
        terms = [tcat.astype(mm_dtype)]
    p = jnp.concatenate(terms, axis=-1) if len(terms) > 1 else terms[0]
    cp = _round_up(p.shape[-1], 128)
    p = jnp.pad(p, ((0, 0), (0, n_pad - N), (0, cp - p.shape[-1])))

    ii = jnp.arange(n_pad, dtype=jnp.int32)
    tril = (ii[:, None] <= ii[None, :]).astype(mm_dtype)
    trilt = (ii[:, None] >= ii[None, :]).astype(mm_dtype)

    pos_c = 6 if return_polar else 3
    pos_rows = 8
    feat_c = C - 3
    nblk = m_pad // qblk

    if C <= _FEAT_T_MAX_C:
        # fully transposed kernel: channels on sublanes, one capture
        praw = (
            jnp.concatenate(terms, axis=-1) if len(terms) > 1 else terms[0]
        )  # [B, N, C*terms]
        ct = _round_up(praw.shape[-1], 16)
        pt = jnp.transpose(praw, (0, 2, 1))
        pt = jnp.pad(pt, ((0, 0), (0, ct - pt.shape[1]), (0, n_pad - N)))
        fc_pad = _round_up(feat_c, 8)
        posT, featT = pl.pallas_call(
            functools.partial(
                _ball_feat_t_kernel, float(radius) ** 2, nsample, C,
                len(terms), mm_dtype, return_polar, out_dtype,
            ),
            grid=(B, nblk),
            in_specs=[
                pl.BlockSpec(
                    (1, 4, n_pad), lambda b, m: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (n_pad, n_pad), lambda b, m: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, ct, n_pad), lambda b, m: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, qblk, 3), lambda b, m: (b, m, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, pos_rows, nsample * qblk), lambda b, m: (b, 0, m),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, fc_pad, nsample * qblk), lambda b, m: (b, 0, m),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(
                    (B, pos_rows, nblk * nsample * qblk), out_dtype
                ),
                jax.ShapeDtypeStruct(
                    (B, fc_pad, nblk * nsample * qblk), out_dtype
                ),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=interpret,
        )(x4, trilt, pt, q)

        def deinterleave(t, rows_used):
            t = t.reshape(B, t.shape[1], nblk, nsample, qblk)
            t = jnp.transpose(t, (0, 2, 4, 3, 1)).reshape(
                B, m_pad, nsample, t.shape[1]
            )
            return t[:, :M, :, :rows_used]

        return deinterleave(posT, pos_c), deinterleave(featT, feat_c)

    # exact 3-term bf16 split of the transposed coordinates for the
    # planar pos capture (rows t*3 + c; padded to 16 sublanes)
    xyz_t = jnp.transpose(xyz_f, (0, 2, 1))  # [B, 3, N]
    if mm_dtype == jnp.bfloat16:
        tterms = _split_bf16_terms(xyz_t)
        pcatt = jnp.concatenate(tterms, axis=1)  # [B, 9, N]
    else:
        pcatt = xyz_t  # f32 path (CPU/interpret): single exact term
    pcatt = jnp.pad(
        pcatt.astype(mm_dtype),
        ((0, 0), (0, 16 - pcatt.shape[1]), (0, n_pad - N)),
    )
    n_cap_terms = 3 if mm_dtype == jnp.bfloat16 else 1

    feat_pad = feat_c if feat_c % 128 == 0 else _round_up(feat_c, 8)
    posT, feat = pl.pallas_call(
        functools.partial(
            _ball_feat_kernel, float(radius) ** 2, nsample, C, len(terms),
            mm_dtype, return_polar, out_dtype, n_cap_terms,
        ),
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec(
                (1, 4, n_pad), lambda b, m: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_pad, n_pad), lambda b, m: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_pad, n_pad), lambda b, m: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 16, n_pad), lambda b, m: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_pad, cp), lambda b, m: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, qblk, 3), lambda b, m: (b, m, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, pos_rows, nsample * qblk), lambda b, m: (b, 0, m),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, qblk, nsample, feat_pad), lambda b, m: (b, m, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (B, pos_rows, nblk * nsample * qblk), out_dtype
            ),
            jax.ShapeDtypeStruct((B, m_pad, nsample, feat_pad), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x4, tril, trilt, pcatt, p, q)

    # de-interleave the planar pos rows: block m's columns are
    # s*qblk + q_local -> [B, M, S, pos_c] via one dense transpose
    pos = posT.reshape(B, pos_rows, nblk, nsample, qblk)
    pos = jnp.transpose(pos, (0, 2, 4, 3, 1)).reshape(
        B, m_pad, nsample, pos_rows
    )
    return pos[:, :M, :, :pos_c], feat[:, :M, :, :feat_c]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3)
)
def _ball_feat_ad(radius, nsample, return_polar, out_dtype,
                  xyz, new_xyz, tcat, valid):
    return _ball_feat_core(
        radius, nsample, xyz, new_xyz, tcat, valid,
        return_polar=return_polar, out_dtype=out_dtype,
    )


def _ball_feat_fwd(radius, nsample, return_polar, out_dtype,
                   xyz, new_xyz, tcat, valid):
    out = _ball_feat_core(
        radius, nsample, xyz, new_xyz, tcat, valid,
        return_polar=return_polar, out_dtype=out_dtype,
    )
    return out, (xyz, new_xyz, valid, tcat.shape[-1])


def _ball_feat_bwd(radius, nsample, return_polar, out_dtype, res, g):
    xyz, new_xyz, valid, c_total = res
    g_pos, g_feat = g
    onehot = _slot_onehot_xla(radius, nsample, xyz, new_xyz, valid)
    # channels 0:3 are the (data-only) query cloud and the pos outputs are
    # functions of data only — no cotangent flows back through them; the
    # trailing channels transpose exactly as in _ball_group_bwd
    drest = jnp.einsum(
        "bmsn,bmsc->bnc", onehot, g_feat.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    dtcat = jnp.pad(drest, ((0, 0), (0, 0), (3, 0)))
    return (None, None, dtcat, None)


_ball_feat_ad.defvjp(_ball_feat_fwd, _ball_feat_bwd)


def ball_group_feature_pallas(
    radius, nsample, xyz, new_xyz, tensors, valid=None,
    return_polar=False, out_dtype=jnp.float32, interpret=False,
):
    """Fused ball query + grouping + SA-input construction (TPU fast path).

    tensors[0] MUST be the reference cloud xyz itself (the SA stages group
    (center, normal, feature)); returns

      pos  [B, M, S, 3(+3)]: center-relative coordinates (+ their
           xyz2sphere when return_polar) — new_feature[..., :pos_channel]
      feat [B, M, S, C-3]:   the remaining grouped channels.

    Together exactly `SurfaceAbstractionCD`'s CD split of its grouped
    new_feature (nn/blocks.py), replacing the ball-query + 3 gathers + the
    relative/polar/concat XLA chain with one kernel.  With
    out_dtype=bfloat16 the outputs equal XLA's own pre-MXU f32->bf16
    convert of the f32 chain (round-to-nearest-even), so default-precision
    matmuls consume bit-identical operands.

    Reference: ballquery_cuda_kernel.cu:47-80 + grouping kernels + the
    Python chain classification/modules/repsurface_utils.py:15-59.
    """
    live = [t for t in tensors if t is not None]
    cat = jnp.concatenate(live, axis=-1) if len(live) > 1 else live[0]
    if interpret:
        return _ball_feat_core(
            radius, nsample, xyz, new_xyz, cat, valid,
            return_polar=return_polar, out_dtype=out_dtype, interpret=True,
        )
    return _ball_feat_ad(
        radius, nsample, return_polar, out_dtype, xyz, new_xyz, cat, valid
    )


def _slot_onehot_xla(radius, nsample, xyz, new_xyz, valid):
    """[B, M, S, N] slot one-hot, identical to the kernel's selection
    (and to ops/neighbors.ball_group's): backward-pass twin."""
    from ..masking import counts_to_mask
    from ..neighbors import _pairwise_dist2

    B, N, _ = xyz.shape
    point_ok = (
        jnp.ones((B, N), bool) if valid is None else counts_to_mask(valid, N)
    )
    d2 = jax.vmap(_pairwise_dist2)(new_xyz, xyz)
    within = ((d2 <= radius * radius) & point_ok[:, None, :]).astype(
        jnp.float32
    )
    n_col = jnp.arange(N, dtype=jnp.int32)
    tril = (n_col[:, None] <= n_col[None, :]).astype(jnp.float32)
    rank = jnp.einsum(
        "bmn,nk->bmk", within, tril, preferred_element_type=jnp.float32
    )
    count = rank[..., -1:]
    rankw = jnp.where(within > 0, rank, 0.0)
    slots = jnp.arange(1, nsample + 1, dtype=jnp.float32)
    target = jnp.where(slots[None, None] <= count, slots[None, None], 1.0)
    onehot = (rankw[:, :, None, :] == target[..., None]).astype(jnp.float32)
    # empty balls gather point 0
    empty = count[..., None] == 0.0
    lane0 = (n_col == 0).astype(jnp.float32)[None, None, None, :]
    return jnp.where(empty, lane0, onehot)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ball_group_ad(radius, nsample, xyz, new_xyz, tcat, valid):
    return _ball_group_core(radius, nsample, xyz, new_xyz, tcat, valid)


def _ball_group_fwd(radius, nsample, xyz, new_xyz, tcat, valid):
    out = _ball_group_core(radius, nsample, xyz, new_xyz, tcat, valid)
    return out, (xyz, new_xyz, valid)


def _ball_group_bwd(radius, nsample, res, g):
    xyz, new_xyz, valid = res
    onehot = _slot_onehot_xla(radius, nsample, xyz, new_xyz, valid)
    # same contraction the XLA route's autodiff emits: scatter-add of the
    # cotangent through the (recomputed) selection
    dtcat = jnp.einsum(
        "bmsn,bmsc->bnc", onehot, g, preferred_element_type=jnp.float32
    )
    return (None, None, dtcat, None)


_ball_group_ad.defvjp(_ball_group_fwd, _ball_group_bwd)


def ball_group_pallas(radius, nsample, xyz, new_xyz, tensors, valid=None,
                      interpret=False):
    """Fused ball query + grouping (Pallas TPU fast path).

    Drop-in equivalent of ops.neighbors.ball_group: returns the grouped
    [B, M, nsample, C_i] slices of each tensor (None passes through),
    bit-identical to ``index_points(t, ball_query(...))``.

    Replaces classification/modules/pointops/src/ballquery/
    ballquery_cuda_kernel.cu:47-80 + the grouping gather kernels as one
    fused device pass.
    """
    live = [t for t in tensors if t is not None]
    cat = jnp.concatenate(live, axis=-1) if len(live) > 1 else live[0]
    if interpret:
        out = _ball_group_core(
            radius, nsample, xyz, new_xyz, cat, valid, interpret=True
        )
    else:
        out = _ball_group_ad(radius, nsample, xyz, new_xyz, cat, valid)
    out = out.astype(cat.dtype)
    res, off = [], 0
    for t in tensors:
        if t is None:
            res.append(None)
        else:
            c = t.shape[-1]
            res.append(out[..., off : off + c].astype(t.dtype))
            off += c
    return res
