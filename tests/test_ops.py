"""Property / golden tests for the core point ops against NumPy oracles."""

import numpy as np
import pytest

from repsurf_tpu import ops
from tests import oracles


def make_cloud(rng, B=3, N=64, scale=1.0):
    return (rng.rand(B, N, 3).astype(np.float32) * 2 - 1) * scale


class TestFPS:
    def test_matches_oracle_dense(self, rng):
        xyz = make_cloud(rng, B=4, N=96)
        got = np.asarray(ops.farthest_point_sample(xyz, 32))
        want = oracles.fps_oracle(xyz, 32)
        np.testing.assert_array_equal(got, want)

    def test_matches_oracle_masked(self, rng):
        xyz = make_cloud(rng, B=4, N=96)
        valid = np.array([96, 50, 17, 3], dtype=np.int32)
        got = np.asarray(ops.farthest_point_sample(xyz, 16, valid=valid))
        want = oracles.fps_oracle(xyz, 16, valid=valid)
        np.testing.assert_array_equal(got, want)
        # never selects padding
        for b in range(4):
            assert (got[b] < valid[b]).all()

    def test_seeds_first_point(self, rng):
        xyz = make_cloud(rng)
        got = np.asarray(ops.farthest_point_sample(xyz, 8))
        assert (got[:, 0] == 0).all()

    def test_no_duplicates_when_enough_points(self, rng):
        xyz = make_cloud(rng, B=2, N=128)
        got = np.asarray(ops.farthest_point_sample(xyz, 64))
        for b in range(2):
            assert len(np.unique(got[b])) == 64


class TestKNN:
    def test_matches_oracle(self, rng):
        xyz = make_cloud(rng, B=3, N=80)
        q = make_cloud(rng, B=3, N=33)
        gi, gd = ops.knn(5, xyz, q)
        wi, wd = oracles.knn_oracle(5, xyz, q)
        np.testing.assert_allclose(np.asarray(gd), wd, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(gi), wi)

    def test_masked_and_padded(self, rng):
        xyz = make_cloud(rng, B=2, N=40)
        q = make_cloud(rng, B=2, N=10)
        valid = np.array([40, 4], dtype=np.int32)
        gi, gd = ops.knn(6, xyz, q, valid=valid)
        wi, wd = oracles.knn_oracle(6, xyz, q, valid=valid)
        np.testing.assert_array_equal(np.asarray(gi), wi)
        # sample 1 has only 4 valid points: slots 4,5 pad with idx 0 / 1e5
        assert (np.asarray(gi)[1, :, 4:] == 0).all()
        np.testing.assert_allclose(np.asarray(gd)[1, :, 4:], np.sqrt(1e10), rtol=1e-5)

    def test_self_query_returns_self_first(self, rng):
        xyz = make_cloud(rng, B=2, N=50)
        gi, gd = ops.knn(4, xyz, xyz)
        np.testing.assert_array_equal(np.asarray(gi)[..., 0], np.arange(50)[None].repeat(2, 0))
        np.testing.assert_allclose(np.asarray(gd)[..., 0], 0.0, atol=1e-3)

    def test_chunked_equals_unchunked(self, rng):
        xyz = make_cloud(rng, B=2, N=70)
        q = make_cloud(rng, B=2, N=37)
        a = ops.knn(3, xyz, q, chunk=8)
        b = ops.knn(3, xyz, q, chunk=64)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


class TestBallQuery:
    def test_matches_oracle(self, rng):
        xyz = make_cloud(rng, B=3, N=60)
        centers = np.asarray(ops.index_points(xyz, ops.farthest_point_sample(xyz, 12)))
        got = np.asarray(ops.ball_query(0.4, 8, xyz, centers))
        want = oracles.ball_query_oracle(0.4, 8, xyz, centers)
        np.testing.assert_array_equal(got, want)

    def test_masked(self, rng):
        xyz = make_cloud(rng, B=2, N=60)
        centers = xyz[:, :5]
        valid = np.array([60, 20], dtype=np.int32)
        got = np.asarray(ops.ball_query(0.5, 6, xyz, centers, valid=valid))
        want = oracles.ball_query_oracle(0.5, 6, xyz, centers, valid=valid)
        np.testing.assert_array_equal(got, want)

    def test_empty_ball_returns_zero(self, rng):
        xyz = make_cloud(rng, B=1, N=20, scale=0.01)
        far = np.full((1, 2, 3), 10.0, dtype=np.float32)
        got = np.asarray(ops.ball_query(0.1, 4, xyz, far))
        assert (got == 0).all()


class TestGather:
    def test_index_points_rank2(self, rng):
        pts = rng.rand(2, 10, 5).astype(np.float32)
        idx = rng.randint(0, 10, (2, 4)).astype(np.int32)
        got = np.asarray(ops.index_points(pts, idx))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b][idx[b]])

    def test_index_points_rank3(self, rng):
        pts = rng.rand(2, 10, 5).astype(np.float32)
        idx = rng.randint(0, 10, (2, 4, 3)).astype(np.int32)
        got = np.asarray(ops.index_points(pts, idx))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b][idx[b]])

    def test_resort_points(self, rng):
        pts = rng.rand(2, 6, 4, 3).astype(np.float32)
        order = np.argsort(rng.rand(2, 6, 4), axis=-1).astype(np.int32)
        got = np.asarray(ops.resort_points(pts, order))
        for b in range(2):
            for n in range(6):
                np.testing.assert_array_equal(got[b, n], pts[b, n][order[b, n]])


class TestInterpolate:
    def test_matches_oracle(self, rng):
        src = make_cloud(rng, B=2, N=30)
        dst = make_cloud(rng, B=2, N=50)
        feat = rng.rand(2, 30, 7).astype(np.float32)
        got = np.asarray(ops.three_interpolate(src, dst, feat))
        want = oracles.interpolate_oracle(src, dst, feat)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_exact_at_source_points(self, rng):
        src = make_cloud(rng, B=1, N=20)
        feat = rng.rand(1, 20, 3).astype(np.float32)
        got = np.asarray(ops.three_interpolate(src, src, feat))
        # weight of the zero-distance neighbor ~= 1 (1e-8 epsilon)
        np.testing.assert_allclose(got, feat, rtol=1e-3, atol=1e-4)


class TestSectorizedFPS:
    def test_full_coverage_properties(self, rng):
        xyz = make_cloud(rng, B=3, N=256)
        idx = np.asarray(ops.sectorized_fps(xyz, 64, 4))
        for b in range(3):
            assert len(np.unique(idx[b])) == 64  # no duplicates
            assert (idx[b] >= 0).all() and (idx[b] < 256).all()

    def test_masked(self, rng):
        xyz = make_cloud(rng, B=2, N=200)
        valid = np.array([200, 120], dtype=np.int32)
        m_valid = valid // 4
        idx = np.asarray(
            ops.sectorized_fps(xyz, 50, 4, valid=valid, m_valid=m_valid)
        )
        for b in range(2):
            sel = idx[b][: m_valid[b]]
            assert (sel < valid[b]).all()
            assert len(np.unique(sel)) == m_valid[b]

    def test_sector_structure(self, rng):
        # every sector of the azimuth range must contribute samples
        xyz = make_cloud(rng, B=1, N=400)
        idx = np.asarray(ops.sectorized_fps(xyz, 100, 4))[0]
        angles = np.arctan2(xyz[0, idx, 0], xyz[0, idx, 1])
        order = np.argsort(np.arctan2(xyz[0, :, 0], xyz[0, :, 1]))
        rank = np.empty(400, dtype=int)
        rank[order] = np.arange(400)
        sectors = rank[idx] * 4 // 400
        counts = np.bincount(sectors, minlength=4)
        assert (counts == 25).all(), counts
        assert angles.size == 100

    def test_approximates_plain_fps_coverage(self, rng):
        # sectorized FPS should cover space comparably to plain FPS: the
        # max distance from any point to its nearest sample is similar.
        xyz = make_cloud(rng, B=1, N=512)
        i_plain = np.asarray(ops.farthest_point_sample(xyz, 128))[0]
        i_sect = np.asarray(ops.sectorized_fps(xyz, 128, 4))[0]

        def cover_radius(samples):
            d = np.linalg.norm(xyz[0][:, None] - xyz[0][samples][None], axis=-1)
            return d.min(1).max()

        assert cover_radius(i_sect) < cover_radius(i_plain) * 1.6


class TestBallGroup:
    """Fused ball-query+gather vs the two-pass composition."""

    def test_matches_two_pass(self, rng):
        xyz = make_cloud(rng, B=3, N=128)
        q = make_cloud(rng, B=3, N=40)
        feat = rng.randn(3, 128, 7).astype(np.float32)
        import jax.numpy as jnp

        got_c, got_f = ops.ball_group(0.5, 8, xyz, q, (xyz, feat))
        gidx = ops.ball_query(0.5, 8, xyz, q)
        np.testing.assert_array_equal(
            np.asarray(got_c), np.asarray(ops.index_points(jnp.asarray(xyz), gidx))
        )
        np.testing.assert_array_equal(
            np.asarray(got_f), np.asarray(ops.index_points(jnp.asarray(feat), gidx))
        )

    def test_masked_and_empty(self, rng):
        xyz = make_cloud(rng, B=2, N=96, scale=5.0)  # sparse: empty balls
        q = make_cloud(rng, B=2, N=30, scale=5.0)
        valid = np.array([96, 11], np.int32)
        (got,) = ops.ball_group(0.2, 6, xyz, q, (xyz,), valid=valid)
        gidx = ops.ball_query(0.2, 6, xyz, q, valid=valid)
        import jax.numpy as jnp

        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ops.index_points(jnp.asarray(xyz), gidx))
        )

    def test_none_passthrough(self, rng):
        xyz = make_cloud(rng, B=1, N=64)
        q = make_cloud(rng, B=1, N=16)
        a, b, c = ops.ball_group(0.4, 4, xyz, q, (xyz, None, xyz))
        assert b is None
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


class TestGatherExactness:
    """The MXU one-hot route must be bit-exact (3-term bf16 split)."""

    def test_split3_identity(self, rng):
        from repsurf_tpu.ops.gather import _split_bf16_terms
        import jax, jax.numpy as jnp

        x = jnp.asarray((rng.randn(64, 32) * 100).astype(np.float32))
        v1, v2, v3 = jax.jit(_split_bf16_terms)(x)
        rec = (
            np.asarray(v1, np.float32)
            + np.asarray(v2, np.float32)
            + np.asarray(v3, np.float32)
        )
        np.testing.assert_array_equal(rec, np.asarray(x))

    def test_onehot_gather_exact(self, rng):
        from repsurf_tpu.ops.gather import _gather_onehot
        import jax, jax.numpy as jnp

        pts = jnp.asarray((rng.randn(2, 96, 5) * 10).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 96, (2, 33)).astype(np.int32))
        got = np.asarray(jax.jit(_gather_onehot)(pts, idx))
        want = np.asarray(jnp.take_along_axis(pts, idx[..., None], axis=1))
        np.testing.assert_array_equal(got, want)

    def test_multi_matches_single(self, rng):
        import jax.numpy as jnp

        a = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        b = jnp.asarray(rng.randn(2, 64, 9).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 64, (2, 10, 4)).astype(np.int32))
        ga, gn, gf = ops.index_points_multi(idx, a, b, None)
        assert gf is None
        np.testing.assert_array_equal(
            np.asarray(ga), np.asarray(ops.index_points(a, idx))
        )
        np.testing.assert_array_equal(
            np.asarray(gn), np.asarray(ops.index_points(b, idx))
        )
