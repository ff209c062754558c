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
