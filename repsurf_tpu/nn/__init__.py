"""Neural modules: primitives, RepSurf/PointNet++ blocks, losses, metrics."""

from .blocks import (
    PointNetFeaturePropagation,
    PointNetSetAbstraction,
    SharedMLP,
    SurfaceAbstraction,
    SurfaceAbstractionCD,
    SurfaceFeaturePropagationCD,
    UmbrellaSurfaceConstructor,
)
from .layers import Linear, MaskedBatchNorm
from .losses import nll_loss, smooth_cls_loss, weighted_cross_entropy
from .metrics import intersection_and_union, iou_from_counts

__all__ = [
    "Linear",
    "MaskedBatchNorm",
    "PointNetFeaturePropagation",
    "PointNetSetAbstraction",
    "SharedMLP",
    "SurfaceAbstraction",
    "SurfaceAbstractionCD",
    "SurfaceFeaturePropagationCD",
    "UmbrellaSurfaceConstructor",
    "intersection_and_union",
    "iou_from_counts",
    "nll_loss",
    "smooth_cls_loss",
    "weighted_cross_entropy",
]
