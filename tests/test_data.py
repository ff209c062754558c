"""Data-layer tests: voxelize, augmentations, preparation, padding."""

import numpy as np
import pytest

import importlib

vox = importlib.import_module("repsurf_tpu.data.voxelize")
from repsurf_tpu.data import aug, s3dis, scanobjectnn


class TestVoxelize:
    def test_train_mode_one_per_voxel(self, rng):
        coord = rng.rand(500, 3) * 2
        idx = vox.voxelize(coord, 0.5, rng=rng)
        picked = np.floor(coord[idx] / 0.5)
        # one pick per occupied voxel, all distinct voxels
        assert len(np.unique(vox.fnv_hash_vec(picked))) == len(idx)
        occupied = len(np.unique(vox.fnv_hash_vec(np.floor(coord / 0.5))))
        assert len(idx) == occupied

    def test_val_mode_covers_everything(self, rng):
        coord = rng.rand(300, 3)
        idx_sort, count = vox.voxelize(coord, 0.3, mode=1)
        assert idx_sort.shape[0] == 300
        assert count.sum() == 300
        # reconstruct the reference's multi-pass cover
        passes = []
        for i in range(count.max()):
            sel = np.cumsum(np.insert(count, 0, 0)[0:-1]) + i % count
            passes.append(idx_sort[sel])
        covered = np.unique(np.concatenate(passes))
        assert covered.size == 300

    def test_hashes_differ(self, rng):
        a = (rng.rand(100, 3) * 50).astype(np.float64)
        assert len(np.unique(vox.fnv_hash_vec(np.floor(a)))) > 50
        assert len(np.unique(vox.ravel_hash_vec(np.floor(a)))) > 50


class TestAug:
    def test_rotate_preserves_norms(self, rng):
        coord = rng.randn(100, 3)
        t = aug.RandomRotate(prob=1.0)
        out, _, _ = t(coord.copy(), None, None, rng)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), np.linalg.norm(coord, axis=1), rtol=1e-6
        )

    def test_scale_bounds(self, rng):
        coord = np.ones((10, 3))
        t = aug.RandomScale(scale=0.1, anisotropic=True, prob=1.0)
        out, _, _ = t(coord.copy(), None, None, rng)
        assert (out >= 0.9 - 1e-9).all() and (out <= 1.1 + 1e-9).all()

    def test_flip_only_xy(self, rng):
        coord = rng.randn(50, 3)
        t = aug.RandomFlip(prob=1.0)
        out, _, _ = t(coord.copy(), None, None, rng)
        np.testing.assert_allclose(np.abs(out), np.abs(coord))
        np.testing.assert_allclose(out[:, 2], coord[:, 2])

    def test_hsv_roundtrip(self, rng):
        rgb = (rng.rand(40, 3) * 255).astype(np.float64)
        hsv = aug.HueSaturationTranslation.rgb_to_hsv(rgb)
        back = aug.HueSaturationTranslation.hsv_to_rgb(hsv)
        assert np.abs(back.astype(float) - rgb).max() < 2.0

    def test_chromatic_clip_range(self, rng):
        feat = rng.rand(30, 3) * 255
        for t in [
            aug.ChromaticTranslation(prob=1.0),
            aug.ChromaticJitter(prob=1.0),
            aug.HueSaturationTranslation(prob=1.0),
        ]:
            _, out, _ = t(None, feat.copy(), None, rng)
            assert out.min() >= 0 and out.max() <= 255

    def test_compose_from_flags(self):
        from repsurf_tpu.config.presets import S3DIS_AUG_ARGS
        from repsurf_tpu.train.train_seg import SegConfig

        cfg = SegConfig(
            color_contrast=True, color_shift=True, color_jitter=True, hs_shift=True
        )
        ct = aug.coord_transform_from_flags(cfg, S3DIS_AUG_ARGS)
        rt = aug.rgb_transform_from_flags(cfg)
        assert ct is None  # no coord flags set in this recipe
        assert len(rt) == 4


class TestDataPrepare:
    def test_pipeline_shapes_and_norm(self, rng):
        coord = rng.rand(5000, 3) * 4
        feat = rng.rand(5000, 3) * 255
        label = rng.randint(0, 13, 5000).astype(np.float64)
        c, f, l = s3dis.data_prepare(
            coord, feat, label, voxel_size=0.1, voxel_max=500, rng=rng
        )
        assert c.shape[0] == f.shape[0] == l.shape[0]
        assert c.shape[0] <= 500
        np.testing.assert_allclose(c.mean(0), 0.0, atol=1e-4)  # mean-centered
        assert np.abs(f).max() < 10  # standardized rgb

    def test_pad_batch(self, rng):
        samples = [
            (rng.rand(50, 3).astype(np.float32), rng.rand(50, 3).astype(np.float32),
             rng.randint(0, 13, 50)),
            (rng.rand(30, 3).astype(np.float32), rng.rand(30, 3).astype(np.float32),
             rng.randint(0, 13, 30)),
        ]
        out = s3dis.pad_batch(samples, 64)
        assert out["coord"].shape == (2, 64, 3)
        np.testing.assert_array_equal(out["valid"], [50, 30])
        assert (out["label"][1, 30:] == 255).all()
        # padding repeats the first point (finite, harmless coords)
        np.testing.assert_allclose(
            out["coord"][1, 30:], np.tile(samples[1][0][0], (34, 1))
        )


class TestSynthetic:
    def test_shapes_and_determinism(self):
        a = scanobjectnn.SyntheticClouds(n_samples=8, n_points=64, seed=3)
        b = scanobjectnn.SyntheticClouds(n_samples=8, n_points=64, seed=3)
        np.testing.assert_array_equal(a.data, b.data)
        pts, lbl = a[0]
        assert pts.shape == (64, 3)
        assert 0 <= lbl < 15

    def test_iterate_batches(self):
        ds = scanobjectnn.SyntheticClouds(n_samples=10, n_points=32)
        batches = list(scanobjectnn.iterate_batches(ds, 4, drop_last=True))
        assert len(batches) == 2
        assert batches[0][0].shape == (4, 32, 3)
