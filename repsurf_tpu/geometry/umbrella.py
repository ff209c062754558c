"""Umbrella triangle-fan construction.

TPU re-implementation of group_by_umbrella / group_by_umbrella_v2
(classification/modules/repsurface_utils.py:112-132,
segmentation/modules/repsurface_utils.py:71-122): kNN around every point,
center-relative coordinates, sort neighbors by azimuth phi, pair each with its
roll-by-1 successor and the centroid => oriented triangle fans.

Layout quirk preserved: the classification pipeline drops the self-neighbor
(``[:, :, 1:]`` after kNN, k -> k-1 fans) while the segmentation pipeline
keeps all k columns — the self point (distance 0) forms degenerate fans that
the repair step overwrites.  ``drop_self`` selects between the two.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import index_points, resort_points
from ..ops.neighbors import knn
from .polar import xyz2sphere


# Truncated reference literals (0.7071, not sqrt(0.5)) as plain Python
# floats: the Pallas umbrella kernel derives its rotation coefficients from
# THIS tuple (jnp scalars would be captured as pallas consts), so the XLA
# and kernel paths cannot drift apart.
FIXED_ROTATION_ROWS = (
    (0.5, -0.5, 0.7071),
    (0.7071, 0.7071, 0.0),
    (-0.5, 0.5, 0.7071),
)


def fixed_rotation_matrix():
    """45 deg about y then 45 deg about z, composed for row-vector points —
    the frame used by group_by_umbrella_v2 (segmentation
    repsurface_utils.py:71-74) to break axis-aligned sorting degeneracies.

    The entries reproduce the reference's *truncated* literals (0.7071, not
    sqrt(0.5)) so azimuth sort orders agree bit-for-bit with the reference."""
    return jnp.asarray(FIXED_ROTATION_ROWS, dtype=jnp.float32)


def group_by_umbrella(xyz, new_xyz, k=9, valid=None, sort_rotation=None, drop_self=False):
    """Build umbrella triangle fans around every query point.

    Args:
      xyz: [B, N, 3] cloud searched for neighbors.
      new_xyz: [B, M, 3] fan centers (the reference always passes the same
        cloud for both).
      k: static int, kNN size (group_size + 1 in the reference configs).
      valid: optional [B] counts for xyz.
      sort_rotation: None for the plain variant; a [3, 3] rotation matrix
        (e.g. ``fixed_rotation_matrix()``) for the v2 'fix' variant that
        computes the sorting azimuth in a rotated frame.
      drop_self: True for the classification pipeline (kNN column 0 — the
        query itself — is removed, k -> k-1 fans).

    Returns:
      [B, M, G, 3, 3] fan vertex coordinates relative to each center, where
      G = k - 1 (``drop_self``) resp. k; vertex 0 is the centroid (origin).
    """
    idx, _ = knn(k, xyz, new_xyz, valid=valid)
    if drop_self:
        idx = idx[:, :, 1:]
    group_xyz = index_points(xyz, idx)  # [B, M, G, 3]
    return _fans_from_neighbors(group_xyz, new_xyz, sort_rotation)


def group_by_umbrella_idx(xyz, new_xyz, idx, sort_rotation=None):
    """Same as group_by_umbrella but with precomputed kNN indices."""
    group_xyz = index_points(xyz, idx)
    return _fans_from_neighbors(group_xyz, new_xyz, sort_rotation)


def _fans_from_neighbors(group_xyz, new_xyz, sort_rotation):
    group_norm = group_xyz - new_xyz[:, :, None, :]  # center-relative
    if sort_rotation is not None:
        phi_frame = group_norm @ sort_rotation
    else:
        phi_frame = group_norm
    phi = xyz2sphere(phi_frame)[..., 2]  # [B, M, G]
    order = jnp.argsort(phi, axis=-1).astype(jnp.int32)
    sorted_xyz = resort_points(group_norm, order)  # [B, M, G, 3]
    rolled = jnp.roll(sorted_xyz, -1, axis=2)
    centroid = jnp.zeros_like(sorted_xyz)
    # vertex axis: (centroid, neighbor_i, neighbor_{i+1})
    return jnp.stack([centroid, sorted_xyz, rolled], axis=-2)


def drop_self_column(group_xyz_idx):
    """Classification-pipeline helper: drop kNN column 0 (the self point)."""
    return group_xyz_idx[:, :, 1:]


def umbrella_features(
    xyz,
    k,
    style="cls",
    return_dist=True,
    valid=None,
    random_inv_sign=None,
    impl="auto",
    interpret=False,
    out_dtype=jnp.float32,
):
    """Full umbrella geometry stage: points -> per-fan surface features.

    Composes group_by_umbrella + cal_normal + cal_center + xyz2sphere +
    cal_const + repair_invalid_group + the style's channel concat — i.e.
    everything in UmbrellaSurfaceConstructor before the shared MLP
    (classification/modules/repsurface_utils.py:276-296, segmentation
    twin :306-321).  On TPU this dispatches to the fused Pallas kernel
    (ops/pallas/umbrella.py); elsewhere (and as the oracle) it runs the
    XLA composition.  Identical outputs either way.

    Args:
      xyz: [B, N, 3] cloud.
      k: static kNN size (group_size + 1).
      style: 'cls' (self dropped, plain azimuth, order [center, polar,
        normal, pos]) or 'seg' (self kept, rotated azimuth, order [polar,
        normal, pos, center]).
      return_dist: include the plane-constant channel.
      valid: optional [B] int32 counts.
      random_inv_sign: optional [B] float (+-1) per-sample normal inversion.
      out_dtype: float32, or bfloat16 (Pallas route only) to emit features
        pre-rounded to bf16 — the value any default-precision MXU consumer
        sees either way, at half the HBM bytes (ops/pallas/umbrella.py
        _fan_geometry_pack_tq).  The XLA route ignores it (always f32).

    Returns:
      feat [B, N, G, C]; G = k-1 ('cls') or k, C = 10 or 9.
    """
    from ..geometry.surface import (
        cal_center,
        cal_const,
        cal_normal,
        repair_invalid_group,
    )

    drop_self = style == "cls"
    G = k - 1 if drop_self else k
    C = 10 if return_dist else 9
    if impl == "auto":
        from ..ops.neighbors import _BUCKET_MIN_N

        # scene scale: the fused kernel's in-VMEM O(N^2) scan loses to the
        # XLA composition once its internal kNN routes to the window kernel
        small = xyz.shape[1] < _BUCKET_MIN_N
        impl = (
            "pallas"
            if jax.default_backend() == "tpu" and G * C <= 128 and small
            else "xla"
        )

    if impl == "pallas":
        feat = _umbrella_pallas_xla_vjp(
            xyz, valid, k, return_dist, style, interpret, out_dtype
        )
        if random_inv_sign is not None:
            # the kernel leaves normals un-inverted; the +-1 sample sign on
            # the normal (and the const it feeds) commutes exactly with the
            # in-kernel repair gather, so apply it to the channels here
            if not return_dist:
                lo, hi = 6, 9
            elif style == "seg":
                lo, hi = 3, 7  # normal 3:6 + pos 6
            else:
                lo, hi = 6, 10  # normal 6:9 + pos 9
            chan = jnp.arange(C)
            inv = random_inv_sign[:, None, None, None]
            # stay in the feature dtype: x * (+-1) is exact in bf16 too, and
            # an f32 multiplier would silently promote the whole tensor back
            sign = jnp.where((chan >= lo) & (chan < hi), inv, 1.0)
            feat = feat * sign.astype(feat.dtype)
        return feat

    sort_rot = fixed_rotation_matrix() if style == "seg" else None
    fans = group_by_umbrella(
        xyz, xyz, k=k, valid=valid, sort_rotation=sort_rot, drop_self=drop_self
    )
    normal, bad = cal_normal(fans, random_inv_sign=random_inv_sign, is_group=True)
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


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _umbrella_pallas_xla_vjp(xyz, valid, k, return_dist, style, interpret, out_dtype):
    """Pallas umbrella forward with the XLA composition as its gradient.

    The fused kernel (ops/pallas/umbrella.py) defines no backward of its
    own.  Rather than silently stopping the gradient on the kernel route
    (the round-3 behavior — a trap for any model feeding learned
    coordinates in), the documented contract is: the gradient of the
    umbrella geometry IS the gradient of the bit-equal XLA composition,
    recomputed in the backward pass.  Both reference pipelines treat xyz
    as data, so this backward never runs in the stock models; when it
    does run, both routes agree (tests/test_geometry.py).
    """
    from ..ops.pallas.umbrella import umbrella_features_pallas

    return umbrella_features_pallas(
        xyz,
        k,
        drop_self=(style == "cls"),
        rotate=(style == "seg"),
        return_dist=return_dist,
        style=style,
        valid=valid,
        interpret=interpret,
        out_dtype=out_dtype,
    )


def _umbrella_pallas_fwd(xyz, valid, k, return_dist, style, interpret, out_dtype):
    out = _umbrella_pallas_xla_vjp(
        xyz, valid, k, return_dist, style, interpret, out_dtype
    )
    return out, (xyz, valid)


def _umbrella_pallas_bwd(k, return_dist, style, interpret, out_dtype, res, g):
    xyz, valid = res

    def xla_route(x):
        return umbrella_features(
            x, k, style=style, return_dist=return_dist, valid=valid, impl="xla"
        )

    _, vjp = jax.vjp(xla_route, xyz)
    (dx,) = vjp(g.astype(jnp.float32))
    d_valid = (
        None if valid is None else np.zeros(valid.shape, dtype=jax.dtypes.float0)
    )
    return dx, d_valid


_umbrella_pallas_xla_vjp.defvjp(_umbrella_pallas_fwd, _umbrella_pallas_bwd)
