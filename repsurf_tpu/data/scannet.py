"""ScanNet segmentation configuration.

The reference carries ScanNet as a second segmentation target
(segmentation/tool/train.py:458-468: 21 classes, voxel 0.02 m, max 120k
points, ignore label 0, loop 6; class weights in util/utils.py:179-186; RGB
stats in :195-196) but ships no ScanNet dataset class (get_dataset_obj only
resolves S3DIS — util/utils.py:136-139).  This module provides the same
constants plus a loader for the common preprocessed per-scene .npy layout
(xyzrgbl, N x 7), reusing the S3DIS pipeline.
"""

import numpy as np

from .s3dis import S3DISDataset

NUM_CLASS = 21
VOXEL_SIZE = 0.02
VOXEL_MAX = 120000
IGNORE_LABEL = 0
LOOP = 6

SCANNET_RGB_MEAN = np.array([0.08400667, 0.08400667, 0.08400667], np.float32)
SCANNET_RGB_STD = np.array([0.28983903, 0.28983903, 0.28983903], np.float32)

# segmentation/util/utils.py:179-186 (train == trainval in the reference)
CLASS_WEIGHTS = [
    0.32051547, 0.1980627, 0.2621471, 0.74563083, 0.52141879, 0.65918949,
    0.73560561, 1.03624985, 1.00063147, 0.90604468, 0.43435155, 3.91494446,
    1.94558718, 1.0, 0.54871637, 2.13587716, 1.13931665, 2.06423695,
    5.59103054, 1.08557339, 1.35027497,
]


class ScanNetDataset(S3DISDataset):
    """Per-scene .npy ScanNet dataset with the reference's constants.

    Expects files named ``scene*.npy`` (xyzrgbl rows).  Splits by a
    ``<split>.txt`` scene list when present, else by filename hash.
    """

    def __init__(self, data_dir, split="train", **kw):
        import os

        kw.setdefault("voxel_size", VOXEL_SIZE)
        kw.setdefault("voxel_max", VOXEL_MAX)
        kw.setdefault("loop", LOOP)
        kw.setdefault("rgb_mean", SCANNET_RGB_MEAN)
        kw.setdefault("rgb_std", SCANNET_RGB_STD)
        # initialize the base with a fake area so its filter passes nothing,
        # then install our own scene list
        super().__init__(data_dir, split="train", test_area=-1, **kw)
        names = sorted(
            f[:-4] for f in os.listdir(data_dir) if f.endswith(".npy")
        )
        list_file = os.path.join(data_dir, f"{split}.txt")
        if os.path.exists(list_file):
            with open(list_file) as f:
                wanted = {ln.strip() for ln in f if ln.strip()}
            self.rooms = [n for n in names if n in wanted]
        else:
            import zlib  # stable across processes, unlike hash()

            def bucket(n):
                return zlib.crc32(n.encode()) % 5

            if split == "train":
                self.rooms = [n for n in names if bucket(n) != 4]
            else:
                self.rooms = [n for n in names if bucket(n) == 4]
        self.split = split
