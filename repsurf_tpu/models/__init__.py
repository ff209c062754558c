"""Model registry.

Replaces the reference's dotted-string importlib resolution
(classification/util/utils.py:72-74, segmentation/util/utils.py:202-204)
with an explicit registry keyed by the same names.
"""

from .pointnet2_seg import PointNet2Segmentor, pointnet2_ssg
from .pointtransformer_seg import PointTransformerSegmentor, pointtransformer
from .repsurf_cls import (
    RepSurfClassifier,
    repsurf_ssg_tri,
    repsurf_ssg_umb,
    repsurf_ssg_umb_2x,
)
from .repsurf_seg import RepSurfSegmentor, repsurf_umb_ssg

_REGISTRY = {
    # classification
    "repsurf.repsurf_ssg_umb": repsurf_ssg_umb,
    "repsurf.repsurf_ssg_umb_2x": repsurf_ssg_umb_2x,
    "repsurf.repsurf_ssg_tri": repsurf_ssg_tri,
    # segmentation
    "repsurf.repsurf_umb_ssg": repsurf_umb_ssg,
    "pointnet2.pointnet2_ssg": pointnet2_ssg,
    "pointtransformer.pointtransformer": pointtransformer,
}


def get_model(name, **kwargs):
    """Build a model by reference-style dotted name."""
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
    return factory(**kwargs)


def register_model(name, factory):
    _REGISTRY[name] = factory


def available_models():
    return sorted(_REGISTRY)


__all__ = [
    "PointNet2Segmentor",
    "RepSurfClassifier",
    "RepSurfSegmentor",
    "available_models",
    "get_model",
    "pointnet2_ssg",
    "register_model",
    "repsurf_ssg_tri",
    "repsurf_ssg_umb",
    "repsurf_ssg_umb_2x",
    "repsurf_umb_ssg",
]
