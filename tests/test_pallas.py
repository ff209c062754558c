"""Pallas kernel tests (interpreter mode on CPU; exact-match vs the XLA
twins, which are themselves oracle-tested in test_ops.py)."""

import numpy as np

from repsurf_tpu.ops.pallas.fps import fps_pallas
from repsurf_tpu.ops.sampling import farthest_point_sample_xla


class TestFPSPallas:
    def test_matches_xla_dense(self, rng):
        xyz = (rng.rand(4, 160, 3) * 2 - 1).astype(np.float32)
        a = np.asarray(fps_pallas(xyz, 48, interpret=True))
        b = np.asarray(farthest_point_sample_xla(xyz, 48))
        np.testing.assert_array_equal(a, b)

    def test_matches_xla_masked(self, rng):
        xyz = (rng.rand(3, 200, 3) * 2 - 1).astype(np.float32)
        valid = np.array([200, 77, 13], np.int32)
        a = np.asarray(fps_pallas(xyz, 16, valid=valid, interpret=True))
        b = np.asarray(farthest_point_sample_xla(xyz, 16, valid=valid))
        np.testing.assert_array_equal(a, b)
        for i in range(3):
            assert (a[i] < valid[i]).all()

    def test_unaligned_shapes(self, rng):
        # B not multiple of block, N not multiple of 128, npoint odd
        xyz = (rng.rand(5, 130, 3) * 2 - 1).astype(np.float32)
        a = np.asarray(fps_pallas(xyz, 7, interpret=True))
        b = np.asarray(farthest_point_sample_xla(xyz, 7))
        np.testing.assert_array_equal(a, b)

    def test_row_blocking(self, rng):
        xyz = (rng.rand(16, 128, 3) * 2 - 1).astype(np.float32)
        a = np.asarray(fps_pallas(xyz, 8, block_rows=8, interpret=True))
        b = np.asarray(farthest_point_sample_xla(xyz, 8))
        np.testing.assert_array_equal(a, b)
