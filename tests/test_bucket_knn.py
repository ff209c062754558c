"""Bucket-grid kNN v2: exact agreement with the brute-force kernel under ANY
configuration — the in-jit guard + fallback makes mis-sized grids slow, not
wrong."""

import numpy as np

from repsurf_tpu.ops.bucket_knn import bucket_knn
from repsurf_tpu.ops.neighbors import knn_xla
from tests.oracles import knn_oracle


def _dense_cloud(rng, B=2, N=2000, extent=4.0):
    return (rng.rand(B, N, 3) * extent).astype(np.float32)


def _check(k, xyz, q, valid=None, **kw):
    # compare against the direct-difference NumPy oracle: bucket_knn uses
    # the same distance formulation, so indices match exactly including
    # ties — the XLA twin's matmul form can swap near-equal pairs
    bi, bd = bucket_knn(k, xyz, q, valid=valid, **kw)
    oi, od = knn_oracle(k, xyz, q, valid=valid)
    np.testing.assert_array_equal(np.asarray(bi), oi)
    np.testing.assert_allclose(np.asarray(bd), od, atol=1e-5)


class TestBucketKNN:
    def test_matches_bruteforce_dense(self, rng):
        xyz = _dense_cloud(rng)
        _check(8, xyz, xyz[:, :500], grid=8)

    def test_self_query(self, rng):
        xyz = _dense_cloud(rng, B=1, N=1500)
        _check(9, xyz, xyz, grid=8)

    def test_masked(self, rng):
        xyz = _dense_cloud(rng, B=2, N=800)
        valid = np.array([800, 300], np.int32)
        _check(6, xyz, xyz[:, :200], valid=valid, grid=8)

    def test_clustered_overflow_falls_back(self, rng):
        # everything in one tight cluster: a single cell overflows cand_max,
        # forcing per-query fallback (and possibly the full-cond path)
        xyz = (rng.randn(1, 600, 3) * 0.01).astype(np.float32)
        _check(5, xyz, xyz[:, :100], grid=8, cand_max=128, fallback_max=32)

    def test_duplicate_points_tie_order(self, rng):
        base = _dense_cloud(rng, B=1, N=300)
        xyz = np.concatenate([base, base], axis=1)  # exact ties everywhere
        _check(7, xyz, xyz[:, :150], grid=8)

    def test_queries_outside_bbox(self, rng):
        xyz = _dense_cloud(rng, B=1, N=700)
        q = xyz[:, :100] + np.float32(5.0)  # all outside the point bbox
        _check(4, xyz, q, grid=8)

    def test_sparse_sample_fewer_than_k(self, rng):
        xyz = _dense_cloud(rng, B=1, N=64)
        valid = np.array([3], np.int32)  # fewer points than k
        bi, bd = bucket_knn(6, xyz, xyz[:, :10], valid=valid, grid=4)
        oi, _ = knn_oracle(6, xyz, xyz[:, :10], valid=valid)
        np.testing.assert_array_equal(np.asarray(bi), oi)
        assert np.allclose(np.asarray(bd)[0, :, 3:], np.sqrt(1e10))

    def test_coarse_grid_still_exact(self, rng):
        # grid=2: cells so coarse most queries pass the guard trivially;
        # grid=16 on few points: most cells empty, k-th dist > pitch =>
        # heavy fallback. Both must stay exact.
        xyz = _dense_cloud(rng, B=1, N=400)
        _check(8, xyz, xyz[:, :80], grid=2)
        _check(8, xyz, xyz[:, :80], grid=16, fallback_max=16)


class TestKNNWindow:
    """Window-pruned Pallas kNN (interpret mode) vs the NumPy oracle —
    exact including lowest-global-index ties."""

    def _check(self, k, xyz, q, valid=None, **kw):
        from repsurf_tpu.ops.pallas.knn_window import knn_window

        bi, bd = knn_window(k, xyz, q, valid=valid, interpret=True, **kw)
        oi, od = knn_oracle(k, xyz, q, valid=valid)
        np.testing.assert_array_equal(np.asarray(bi), oi)
        np.testing.assert_allclose(np.asarray(bd), od, atol=1e-5)

    def test_matches_oracle(self, rng):
        xyz = _dense_cloud(rng, B=2, N=1200)
        self._check(8, xyz, xyz[:, :300], grid2d=8)

    def test_self_query(self, rng):
        xyz = _dense_cloud(rng, B=1, N=900)
        self._check(9, xyz, xyz, grid2d=8)

    def test_masked(self, rng):
        xyz = _dense_cloud(rng, B=2, N=700)
        valid = np.array([700, 250], np.int32)
        self._check(6, xyz, xyz[:, :150], valid=valid, grid2d=8)

    def test_duplicates_tie_order(self, rng):
        base = _dense_cloud(rng, B=1, N=250)
        xyz = np.concatenate([base, base], axis=1)
        self._check(7, xyz, xyz[:, :130], grid2d=8)

    def test_overflow_and_outside(self, rng):
        # a coarse grid concentrates whole columns past the run cap and a
        # tiny window budget forces packed-window overflow; shifted queries
        # exercise the outside-grid path — all land in the fallback
        xyz = _dense_cloud(rng, B=1, N=900)
        q = np.concatenate(
            [xyz[:, :80], xyz[:, :40] + np.float32(4.0)], axis=1
        )
        self._check(5, xyz, q, grid2d=4, w_budget=1280, fallback_max=64)

    def test_sparse_fewer_than_k(self, rng):
        from repsurf_tpu.ops.pallas.knn_window import knn_window

        xyz = _dense_cloud(rng, B=1, N=140)
        valid = np.array([4], np.int32)
        bi, bd = knn_window(6, xyz, xyz[:, :20], valid=valid, grid2d=4,
                            interpret=True)
        oi, _ = knn_oracle(6, xyz, xyz[:, :20], valid=valid)
        np.testing.assert_array_equal(np.asarray(bi), oi)
        assert np.allclose(np.asarray(bd)[0, :, 4:], np.sqrt(1e10))
