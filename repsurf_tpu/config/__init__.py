"""Configuration: dataclass configs (in train/) + named recipe presets."""

from .presets import (
    PRESETS,
    S3DIS_AUG_ARGS,
    SCANOBJECTNN_AUG_ARGS,
    get_preset,
)

__all__ = ["PRESETS", "S3DIS_AUG_ARGS", "SCANOBJECTNN_AUG_ARGS", "get_preset"]
