"""Triangular RepSurf constructor (the paper's non-umbrella variant).

Re-designs classification/modules/recons_utils.py:179-228
(SurfaceConstructor + knn_recons): each point reconstructs one triangle from
its k=3 nearest context points; the unit normal, centroid, and optional
plane constant become the surface features.  Degenerate triangles are
repaired from the sample's first valid point (check_nan,
recons_utils.py:127-149).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..geometry.surface import cal_center, cal_const, cal_normal, repair_invalid_points
from ..ops.gather import index_points
from ..ops.neighbors import knn


def knn_recons(k, center, context, valid=None):
    """kNN triangle vertices: [B, N, k, 3] (recons_utils.py:18-24)."""
    idx, _ = knn(k, context, center, valid=valid)
    return index_points(context, idx)


class SurfaceConstructor(nn.Module):
    """Triangular surface constructor.

    Plane formulation: A(x-x0) + B(y-y0) + C(z-z0) = 0 with A^2+B^2+C^2 = 1
    and A > 0 (sign fix), optionally randomly inverted per sample.

    Returns (normal [B,N,3], center [B,N,3][, pos [B,N,1]]).
    """

    k: int = 3
    recons_type: str = "knn"
    return_dist: bool = False
    random_inv: bool = True

    @nn.compact
    def __call__(self, center, context=None, valid=None):
        if self.recons_type != "knn":
            raise NotImplementedError(self.recons_type)
        if context is None:
            context = center
        group_xyz = knn_recons(self.k, center, context, valid=valid)

        inv_sign = None
        if self.random_inv and self.has_rng("random_inv"):
            import jax

            key = self.make_rng("random_inv")
            inv_sign = (
                jax.random.bernoulli(key, 0.5, (center.shape[0],)).astype(
                    jnp.float32
                )
                * 2.0
                - 1.0
            )
        normal, bad = cal_normal(group_xyz, random_inv_sign=inv_sign, is_group=False)
        tri_center = cal_center(group_xyz)

        if self.return_dist:
            pos = cal_const(normal, tri_center)
            normal, tri_center, pos = repair_invalid_points(
                bad, normal, tri_center, pos
            )
            return normal, tri_center, pos
        normal, tri_center = repair_invalid_points(bad, normal, tri_center)
        return normal, tri_center
