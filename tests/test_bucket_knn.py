"""Bucket-grid kNN: exact agreement with the brute-force kernel whenever the
grid contract (cell_size > kth distance, per-cell count <= cap) holds."""

import numpy as np

from repsurf_tpu.ops.bucket_knn import bucket_knn, bucket_knn_check
from repsurf_tpu.ops.neighbors import knn_xla


def _dense_cloud(rng, B=2, N=2000, extent=4.0):
    return (rng.rand(B, N, 3) * extent).astype(np.float32)


class TestBucketKNN:
    def test_matches_bruteforce_dense(self, rng):
        xyz = _dense_cloud(rng)
        q = xyz[:, :500]
        bi, bd = bucket_knn(8, xyz, q, cell_size=1.0, grid=8, cell_cap=256)
        xi, xd = knn_xla(8, xyz, q)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(xi))
        np.testing.assert_allclose(np.asarray(bd), np.asarray(xd), atol=3e-3)

    def test_masked(self, rng):
        xyz = _dense_cloud(rng, B=2, N=800)
        valid = np.array([800, 300], np.int32)
        q = xyz[:, :200]
        bi, _ = bucket_knn(6, xyz, q, cell_size=1.5, valid=valid, grid=8,
                           cell_cap=512)
        xi, _ = knn_xla(6, xyz, q, valid=valid)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(xi))

    def test_check_flags_overflow(self, rng):
        # everything in one cell: counts must exceed a small cap
        xyz = (rng.rand(1, 500, 3) * 0.01).astype(np.float32)
        max_count, _ = bucket_knn_check(
            xyz, cell_size=1.0, kth_dist=np.float32(0.1), grid=8, cell_cap=64
        )
        assert int(max_count) == 500

    def test_check_radius(self, rng):
        xyz = _dense_cloud(rng, B=1, N=500)
        _, ok = bucket_knn_check(
            xyz, cell_size=0.5, kth_dist=np.asarray([0.6], np.float32), grid=8
        )
        assert not bool(ok)
        _, ok = bucket_knn_check(
            xyz, cell_size=0.5, kth_dist=np.asarray([0.3], np.float32), grid=8
        )
        assert bool(ok)

    def test_self_query_first(self, rng):
        xyz = _dense_cloud(rng, B=1, N=600)
        bi, bd = bucket_knn(4, xyz, xyz, cell_size=1.0, grid=8, cell_cap=512)
        np.testing.assert_array_equal(
            np.asarray(bi)[0, :, 0], np.arange(600)
        )
        np.testing.assert_allclose(np.asarray(bd)[0, :, 0], 0.0)
