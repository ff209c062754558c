"""Point-cloud operator library (the TPU equivalent of the reference's
``pointops`` CUDA extensions — see SURVEY.md §2a/2b).

All ops are batched over a leading B dimension, use static shapes, and take
an optional ``valid: [B]`` count for padded batches.
"""

from .bucket_knn import bucket_knn
from .gather import index_points, index_points_multi, resort_points, select_group
from .interpolate import interpolate_weights, three_interpolate
from .masking import BIG_DIST2, counts_to_mask, full_counts
from .neighbors import ball_group, ball_query, knn, knn_xla
from .pallas.knn_window import knn_window
from .sampling import farthest_point_sample, farthest_point_sample_xla
from .sector import sectorized_fps

__all__ = [
    "BIG_DIST2",
    "ball_group",
    "ball_query",
    "bucket_knn",
    "counts_to_mask",
    "farthest_point_sample",
    "farthest_point_sample_xla",
    "full_counts",
    "index_points",
    "index_points_multi",
    "interpolate_weights",
    "knn",
    "knn_window",
    "knn_xla",
    "resort_points",
    "select_group",
    "sectorized_fps",
    "three_interpolate",
]
