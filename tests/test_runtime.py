"""Tests for the native shared-memory arena and prefetch loader."""

import numpy as np
import pytest

from repsurf_tpu.runtime import PrefetchLoader, shm


class TestShmArena:
    def test_create_attach_roundtrip(self, rng):
        arr = rng.rand(17, 5).astype(np.float32)
        name = "/rs_test_roundtrip"
        try:
            view = shm.create(name, arr)
            np.testing.assert_array_equal(np.asarray(view), arr)
            if shm._load() is not None:
                got = shm.attach(name)
                np.testing.assert_array_equal(np.asarray(got), arr)
                assert not got.flags.writeable
        finally:
            shm.unlink(name)

    def test_dtype_preserved(self, rng):
        for dtype in (np.int32, np.int64, np.float64, np.uint8):
            arr = (rng.rand(7, 3) * 100).astype(dtype)
            name = f"/rs_test_dtype_{np.dtype(dtype).name}"
            try:
                shm.create(name, arr)
                if shm._load() is not None:
                    got = shm.attach(name)
                    assert got.dtype == dtype
                    np.testing.assert_array_equal(np.asarray(got), arr)
            finally:
                shm.unlink(name)

    def test_exists_unlink(self, rng):
        name = "/rs_test_exists"
        shm.create(name, np.zeros(4, np.float32))
        assert shm.exists(name)
        shm.unlink(name)
        assert not shm.exists(name)

    def test_writable_attach_shares(self, rng):
        if shm._load() is None:
            pytest.skip("native arena unavailable")
        name = "/rs_test_share"
        try:
            a = shm.create(name, np.zeros((4,), np.float32))
            b = shm.attach(name, writable=True)
            b[2] = 7.5
            assert float(a[2]) == 7.5
        finally:
            shm.unlink(name)


def _make_batch(indices, seed):
    rng = np.random.RandomState(seed)
    return {
        "x": (np.asarray(indices, np.float32)[:, None] + rng.rand(len(indices), 3)
              ).astype(np.float32),
        "y": np.asarray(indices, np.int64),
    }


class TestPrefetchLoader:
    def test_synchronous_mode(self):
        loader = PrefetchLoader(
            _make_batch, n_items=10, batch_size=4, n_workers=0, shuffle=False
        )
        batches = list(loader.epoch(0))
        assert len(batches) == 2
        np.testing.assert_array_equal(batches[0]["y"], [0, 1, 2, 3])

    def test_worker_mode_covers_all(self):
        loader = PrefetchLoader(
            _make_batch,
            n_items=12,
            batch_size=3,
            n_workers=2,
            n_slots=3,
            shuffle=True,
            name="t1",
        )
        try:
            seen = []
            for b in loader.epoch(0):
                seen.extend(np.asarray(b["y"]).tolist())
            assert sorted(seen) == list(range(12))
        finally:
            loader.close()

    def test_epochs_reshuffle(self):
        loader = PrefetchLoader(
            _make_batch, n_items=16, batch_size=4, n_workers=0, shuffle=True
        )
        e0 = [tuple(b["y"].tolist()) for b in loader.epoch(0)]
        e1 = [tuple(b["y"].tolist()) for b in loader.epoch(1)]
        assert e0 != e1
