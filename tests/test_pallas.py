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


class TestKNNPallas:
    def test_matches_xla(self, rng):
        from repsurf_tpu.ops.pallas.knn import knn_pallas
        from repsurf_tpu.ops.neighbors import knn_xla

        xyz = (rng.rand(3, 200, 3) * 2 - 1).astype(np.float32)
        q = (rng.rand(3, 70, 3) * 2 - 1).astype(np.float32)
        valid = np.array([200, 90, 4], np.int32)
        ip, dp = knn_pallas(6, xyz, q, valid=valid, interpret=True)
        ix, dx = knn_xla(6, xyz, q, valid=valid)
        np.testing.assert_array_equal(np.asarray(ip), np.asarray(ix))
        # pallas computes exact coordinate differences; the XLA matmul form
        # loses ~1e-3 to cancellation near zero — compare loosely
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dx), atol=3e-3)
        # missing slots carry the sentinel
        assert np.allclose(np.asarray(dp)[2, :, 4:], np.sqrt(1e10))

    def test_self_query(self, rng):
        from repsurf_tpu.ops.pallas.knn import knn_pallas

        xyz = (rng.rand(2, 96, 3) * 2 - 1).astype(np.float32)
        ip, dp = knn_pallas(4, xyz, xyz, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(ip)[..., 0], np.arange(96)[None].repeat(2, 0)
        )
        np.testing.assert_allclose(np.asarray(dp)[..., 0], 0.0)  # exact zero

    def test_block_splitting(self, rng):
        from repsurf_tpu.ops.pallas.knn import knn_pallas
        from repsurf_tpu.ops.neighbors import knn_xla

        xyz = (rng.rand(1, 300, 3)).astype(np.float32)
        q = (rng.rand(1, 100, 3)).astype(np.float32)
        ip, _ = knn_pallas(5, xyz, q, block_q=16, interpret=True)
        ix, _ = knn_xla(5, xyz, q)
        np.testing.assert_array_equal(np.asarray(ip), np.asarray(ix))
