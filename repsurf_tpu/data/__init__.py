"""Data layer: datasets, augmentations, voxelization, device transforms."""

from . import aug, transforms
from .modelnet40 import ModelNet40Dataset
from .s3dis import S3DISDataset, data_prepare, pad_batch
from .scannet import ScanNetDataset
from .scanobjectnn import ScanObjectNNDataset, SyntheticClouds, iterate_batches
from .voxelize import fnv_hash_vec, ravel_hash_vec, voxelize

__all__ = [
    "ModelNet40Dataset",
    "S3DISDataset",
    "ScanNetDataset",
    "ScanObjectNNDataset",
    "SyntheticClouds",
    "aug",
    "data_prepare",
    "fnv_hash_vec",
    "iterate_batches",
    "pad_batch",
    "ravel_hash_vec",
    "transforms",
    "voxelize",
]
