"""Geometry library: polar transforms, triangle surfaces, umbrella fans
(the TPU analog of the reference's polar_utils / recons_utils / the grouping
half of repsurface_utils — SURVEY.md §2d)."""

from .polar import xyz2cylind, xyz2sphere
from .surface import (
    cal_area,
    pca,
    cal_center,
    cal_const,
    cal_normal,
    repair_invalid_group,
    repair_invalid_points,
)
from .umbrella import (
    fixed_rotation_matrix,
    group_by_umbrella,
    group_by_umbrella_idx,
)

__all__ = [
    "cal_area",
    "cal_center",
    "cal_const",
    "cal_normal",
    "pca",
    "fixed_rotation_matrix",
    "group_by_umbrella",
    "group_by_umbrella_idx",
    "repair_invalid_group",
    "repair_invalid_points",
    "xyz2cylind",
    "xyz2sphere",
]
