"""Triangle-surface geometry: normals, centroids, plane constants, repair.

TPU re-implementation of classification/modules/recons_utils.py:27-176 (and
the segmentation twin recons_utils.py:10-138).

One deliberate deviation: the reference lets degenerate (collinear) triangles
produce NaN normals and repairs them afterwards by *NaN detection*
(check_nan_umb).  On TPU we avoid manufacturing NaNs — the division is made
safe and degeneracy is tracked as an explicit boolean mask, which
``repair_invalid`` consumes.  The repaired outputs are identical; gradients
are additionally finite (the reference's backward is NaN-poisoned for
degenerate inputs).
"""

import jax.numpy as jnp


def cal_normal(group_xyz, random_inv_sign=None, is_group=False):
    """Unit triangle normals, sign-fixed (x > 0) with optional inversion.

    Mirrors recons_utils.py:27-57.  ``group_xyz`` is [..., K=3, 3] — for the
    umbrella path [B, N, G, 3, 3] (``is_group=True``), for the triangular
    path [B, N, 3, 3].

    Args:
      group_xyz: triangle vertex coordinates.
      random_inv_sign: optional [B] float (+1/-1) per-sample inversion mask —
        the functional analog of the reference's in-forward RNG (prob 0.5
        per batch element / offset segment).
      is_group: True when a G fan axis is present; the x>0 sign fix then uses
        fan 0's normal for all fans of a point (reference `[..., 0:1, 0]`).

    Returns:
      (unit_normal [..., 3], degenerate [...] bool) — degenerate marks
      zero-area triangles whose reference normal would be NaN.
    """
    e1 = group_xyz[..., 1, :] - group_xyz[..., 0, :]
    e2 = group_xyz[..., 2, :] - group_xyz[..., 0, :]
    nor = jnp.cross(e1, e2)
    # sqrt on a guarded input: sqrt'(0) is inf and a where() after the fact
    # does not block it (0 * inf = NaN in the chain rule)
    s = jnp.sum(jnp.square(nor), axis=-1, keepdims=True)
    degenerate = jnp.squeeze(s, -1) == 0.0
    norm = jnp.sqrt(jnp.where(s == 0.0, 1.0, s))
    unit = jnp.where(s == 0.0, 0.0, nor / norm)

    if is_group:
        # sign decided by fan 0 of each point, broadcast over the fan axis
        ref_x = unit[..., 0:1, 0]
    else:
        ref_x = unit[..., 0]
    sign = jnp.where(ref_x > 0, 1.0, -1.0)
    unit = unit * sign[..., None]

    if random_inv_sign is not None:
        extra = unit.ndim - 2  # broadcast [B] over point/fan axes
        inv = random_inv_sign.reshape((-1,) + (1,) * extra + (1,))
        unit = unit * inv
    return unit, degenerate


def cal_center(group_xyz):
    """Triangle centroid: mean over the K vertex axis (recons_utils.py:82-90)."""
    return jnp.mean(group_xyz, axis=-2)


def cal_const(normal, center, is_normalize=True):
    """Plane constant n.c (normalized by sqrt(3)); recons_utils.py:108-124."""
    const = jnp.sum(normal * center, axis=-1, keepdims=True)
    return const / jnp.sqrt(3.0) if is_normalize else const


def cal_area(group_xyz):
    """Triangle "area" via projected homogeneous determinants
    (recons_utils.py:93-105).  Note: like the reference, this returns twice
    the true area (each determinant is 2x the projected signed area)."""
    v0, v1, v2 = (group_xyz[..., i, :] for i in range(3))

    def det3(a, b):
        # |a b 1| determinant for the three vertices' (a, b) coordinates
        return (
            a[..., 0] * (b[..., 1] - b[..., 2])
            - b[..., 0] * (a[..., 1] - a[..., 2])
            + (a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1])
        )

    x = jnp.stack([v0[..., 0], v1[..., 0], v2[..., 0]], axis=-1)
    y = jnp.stack([v0[..., 1], v1[..., 1], v2[..., 1]], axis=-1)
    z = jnp.stack([v0[..., 2], v1[..., 2], v2[..., 2]], axis=-1)
    det_xy = det3(x, y)
    det_yz = det3(y, z)
    det_zx = det3(z, x)
    area = jnp.sqrt(det_xy**2 + det_yz**2 + det_zx**2)
    return area[..., None]


def pca(x, k, center=True):
    """Principal component analysis via SVD (recons_utils.py:60-79; unused by
    the reference models but part of the library surface).

    Args:
      x: [n, d] points.
      k: number of components.

    Returns:
      dict with 'components' [d, k] and 'explained_variance' [k].
    """
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True) if center else x
    _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    return {
        "x": x,
        "k": k,
        "components": vt[:k].T,
        "explained_variance": (s[:k] * s[:k]) / (n - 1),
    }


def repair_invalid_group(bad, *tensors):
    """Replace bad fans with each point's first good fan.

    Functional analog of check_nan_umb (recons_utils.py:152-176): for every
    point, fans flagged ``bad`` are overwritten — jointly across all given
    tensors — by the values of the first non-bad fan (argmax of ~bad; if all
    fans are bad, fan 0 is used, as in the reference).

    Args:
      bad: [B, N, G] bool.
      *tensors: arrays shaped [B, N, G, C].

    Returns:
      tuple of repaired tensors (same order).
    """
    from ..ops.gather import select_group

    first_ok = jnp.argmax(~bad, axis=-1)  # [B, N]
    out = []
    for t in tensors:
        repl = select_group(t, first_ok)[:, :, None, :]
        out.append(jnp.where(bad[..., None], repl, t))
    return tuple(out)


def repair_invalid_points(bad, *tensors):
    """Per-sample variant of check_nan (recons_utils.py:127-149): bad points
    are replaced by the sample's first good point.

    Args:
      bad: [B, N] bool; *tensors: [B, N, C].
    """
    first_ok = jnp.argmax(~bad, axis=-1)  # [B]
    out = []
    for t in tensors:
        repl = jnp.take_along_axis(t, first_ok[:, None, None], axis=1)
        out.append(jnp.where(bad[..., None], repl, t))
    return tuple(out)
