"""Tests for the --synthetic segmentation data stack and the REAL CLI loops.

The synthetic stack (data/synthetic_scene.py) is the no-dataset stand-in for
S3DIS (reference dataset/S3DISDataLoader.py:16-48 semantics: rooms -> loop ->
per-sample data_prepare).  These tests pin:
  * label_room's geometric rule (the learnable labeling the convergence
    evidence depends on),
  * SyntheticRooms determinism per seed and train/val universe separation,
  * class coverage surviving the real data_prepare pipeline,
  * and — via ``main()`` micro-runs — the full epoch/val/checkpoint/resume
    loop of tools/train_seg.py and the whole-scene protocol of
    tools/test_s3dis.py (reference tool/train.py:261-409,
    tool/test_s3dis.py:186-251), which previously only ran at launch time.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from repsurf_tpu.data.synthetic_scene import (
    SyntheticRooms,
    label_room,
    synthetic_room,
)

SYNTH_CLASSES = {0, 1, 2, 7, 8}


class TestLabelRoom:
    def test_geometric_rule(self):
        size = (8.0, 8.0, 3.0)
        coord = np.array(
            [
                [4.0, 4.0, 0.01],  # floor
                [4.0, 4.0, 2.99],  # ceiling
                [0.01, 4.0, 1.5],  # wall (x=0)
                [7.99, 4.0, 1.5],  # wall (x=sx)
                [4.0, 0.01, 1.5],  # wall (y=0)
                [4.0, 4.0, 0.5],   # low furniture
                [4.0, 4.0, 1.2],   # high furniture
            ],
            np.float32,
        )
        lab = label_room(coord, size)
        assert lab.tolist() == [1, 0, 2, 2, 2, 7, 8]

    def test_precedence_floor_beats_wall(self):
        # a corner point is both wall-close and floor-close; floor wins
        # (label_room applies floor/ceiling after wall)
        size = (8.0, 8.0, 3.0)
        lab = label_room(np.array([[0.01, 0.01, 0.01]], np.float32), size)
        assert lab[0] == 1

    def test_only_synth_classes(self):
        rng = np.random.RandomState(3)
        size = (7.0, 9.0, 3.0)
        coord = synthetic_room(20000, size=size, rng=rng)
        lab = label_room(coord, size)
        assert set(np.unique(lab)) <= SYNTH_CLASSES


class TestSyntheticRooms:
    def test_deterministic_per_seed(self):
        a = SyntheticRooms("train", n_rooms=2, raw_points=4000, seed=7)
        b = SyntheticRooms("train", n_rooms=2, raw_points=4000, seed=7)
        ra, rb = a._make(1), b._make(1)
        np.testing.assert_array_equal(ra, rb)
        sa = a.get(1, rng=np.random.RandomState(0))
        sb = b.get(1, rng=np.random.RandomState(0))
        for xa, xb in zip(sa, sb):
            np.testing.assert_array_equal(xa, xb)

    def test_seed_changes_rooms(self):
        a = SyntheticRooms("train", n_rooms=1, raw_points=4000, seed=7)
        b = SyntheticRooms("train", n_rooms=1, raw_points=4000, seed=8)
        assert not np.array_equal(a._make(0), b._make(0))

    def test_train_val_universes_differ(self):
        tr = SyntheticRooms("train", n_rooms=2, raw_points=4000, seed=7)
        va = SyntheticRooms("val", n_rooms=2, raw_points=4000, seed=7)
        assert not np.array_equal(tr._make(0), va._make(0))

    def test_loop_replays_rooms(self):
        ds = SyntheticRooms("train", n_rooms=2, raw_points=4000, loop=3, seed=7)
        assert len(ds) == 6
        s0 = ds.get(0, rng=np.random.RandomState(5))
        s2 = ds.get(2, rng=np.random.RandomState(5))  # same room, same rng
        np.testing.assert_array_equal(s0[0], s2[0])

    def test_all_classes_present_post_pipeline(self):
        # the labeling must survive the REAL data_prepare (aug -> voxelize ->
        # crop -> shuffle -> normalize) or the convergence evidence is hollow
        ds = SyntheticRooms(
            "train", n_rooms=1, raw_points=20000, voxel_size=0.04,
            voxel_max=8000, seed=11,
        )
        coord, feat, label = ds.get(0, rng=np.random.RandomState(0))
        assert SYNTH_CLASSES <= set(np.unique(label))
        assert len(coord) == len(feat) == len(label) <= 8000
        # data_prepare normalized: coords mean-centered, rgb standardized
        assert abs(coord.mean(0)).max() < 1e-3
        assert np.isfinite(feat).all()


@pytest.mark.slow
class TestSegCLIMicroRun:
    """Run the REAL tools/train_seg.py + tools/test_s3dis.py main() loops
    end-to-end on tiny synthetic rooms: epoch loop, freeze flip, per-epoch
    val, best-mIoU checkpointing, resume, and the whole-scene protocol."""

    def _argv(self, log_root, extra):
        base = [
            "train_seg.py", "--synthetic",
            "--synthetic_rooms", "2", "--synthetic_raw", "3000",
            "--voxel_max", "256", "--voxel_size", "0.04",
            "--batch_size", "2", "--batch_size_val", "2",
            "--loop", "2", "--min_val", "0", "--val_freq", "1",
            "--n_devices", "2", "--log_root", log_root,
            "--log_dir", "micro", "--seed", "2000",
        ]
        return base + extra

    def test_train_main_resume_and_whole_scene_eval(self, tmp_path, monkeypatch):
        import train_seg as train_seg_cli
        import test_s3dis as test_s3dis_cli

        # the CLIs enable the PERSISTENT compilation cache — a process-global
        # jax.config flip that would leak into every later suite test AND
        # share the on-disk cache with any concurrently-running CLI process
        # (observed: concurrent cache read/write segfaulted a later test's
        # backend_compile in two full-suite runs).  Tests compile cache-less.
        import repsurf_tpu.utils.platform as platform_mod

        monkeypatch.setattr(
            platform_mod, "enable_compilation_cache", lambda path=None: None
        )

        log_root = str(tmp_path / "log")

        # --- 2 epochs with the freeze flip at epoch 2 ---
        monkeypatch.setattr(
            sys, "argv",
            self._argv(log_root, ["--epoch", "2", "--freeze_epoch", "1"]),
        )
        best = train_seg_cli.main()
        assert np.isfinite(best) and 0.0 <= best <= 1.0
        ckpt_dir = os.path.join(log_root, "S3DIS", "micro", "checkpoints")
        assert os.path.isdir(os.path.join(ckpt_dir, "best")), (
            "best-mIoU checkpoint was not written"
        )

        # --- kill/resume: restart from the checkpoint for one more epoch ---
        monkeypatch.setattr(
            sys, "argv",
            self._argv(
                log_root,
                ["--epoch", "3", "--freeze_epoch", "1", "--resume", ckpt_dir],
            ),
        )
        best2 = train_seg_cli.main()
        assert np.isfinite(best2) and best2 >= 0.0

        # --- whole-scene protocol from the restored checkpoint ---
        monkeypatch.setattr(
            sys, "argv",
            [
                "test_s3dis.py", "--synthetic",
                "--synthetic_rooms", "1", "--synthetic_raw", "3000",
                "--synthetic_seed", "2000",
                "--voxel_max", "256", "--voxel_size", "0.04",
                "--batch_size_test", "2",
                "--log_root", log_root, "--log_dir", "micro",
            ],
        )
        miou, macc, allacc = test_s3dis_cli.main()
        assert np.isfinite(miou) and 0.0 <= miou <= 1.0
        assert np.isfinite(allacc) and 0.0 <= allacc <= 1.0
