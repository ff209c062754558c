"""ScanObjectNN dataset (classification).

Mirrors classification/dataset/ScanObjectNNDataLoader.py:13-35: the
PB_T50_RS hardest variant h5 files (2048 points, 15 classes, background
kept).  Returns channels-last [N, 3] clouds (the reference returns the
transpose [3, N]; the TPU layout is channels-last throughout).

Also provides a deterministic synthetic stand-in with the same shapes for
tests and benchmarks on machines without the dataset.
"""

import os

import numpy as np

NUM_CLASS = 15
NUM_POINT_RAW = 2048


class ScanObjectNNDataset:
    def __init__(self, root, split="training", bg=True):
        assert split in ("training", "test")
        dir_name = "main_split" if bg else "main_split_nobg"
        h5_name = os.path.join(
            root, dir_name, split + "_objectdataset_augmentedrot_scale75.h5"
        )
        import h5py

        with h5py.File(h5_name, mode="r") as f:
            self.data = f["data"][:].astype(np.float32)  # [S, 2048, 3]
            self.label = f["label"][:].astype(np.int64)

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, index):
        return self.data[index], self.label[index]


class SyntheticClouds:
    """Deterministic class-structured random clouds with ScanObjectNN shapes.

    Each class is a Gaussian blob mixture with a class-specific geometry so a
    model can actually fit it — used by the micro-training tests (SURVEY.md
    §4 strategy (b)) and by bench.py when the real h5 files are absent.
    """

    def __init__(
        self,
        n_samples=256,
        n_points=NUM_POINT_RAW,
        n_class=NUM_CLASS,
        seed=0,
        centers_seed=42,
    ):
        rng = np.random.RandomState(seed)
        self.label = rng.randint(0, n_class, size=n_samples).astype(np.int64)
        # class geometry comes from its own seed so differently-seeded train
        # and test splits share the same classes
        centers = np.random.RandomState(centers_seed).randn(n_class, 4, 3).astype(
            np.float32
        ) * 0.5
        data = []
        for s in range(n_samples):
            c = centers[self.label[s]]
            pick = rng.randint(0, 4, size=n_points)
            pts = c[pick] + rng.randn(n_points, 3).astype(np.float32) * 0.1
            data.append(pts)
        self.data = np.stack(data).astype(np.float32)

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, index):
        return self.data[index], self.label[index]


def iterate_batches(dataset, batch_size, shuffle=False, drop_last=False, rng=None):
    """Minimal host-side batcher: yields (points [B, N, 3], labels [B])."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        (rng or np.random).shuffle(order)
    stop = n - (n % batch_size) if drop_last else n
    for s in range(0, stop, batch_size):
        idx = order[s : s + batch_size]
        pts = np.stack([dataset[i][0] for i in idx])
        lbl = np.array([dataset[i][1] for i in idx])
        yield pts, lbl
