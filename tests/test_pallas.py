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

    def test_return_xyz_matches_gather(self, rng):
        """The in-kernel coordinate capture must equal index_points(xyz, idx)
        exactly (it replaces that gather in data.transforms.fps_sample)."""
        from repsurf_tpu.ops.gather import index_points

        xyz = (rng.rand(5, 300, 3) * 2 - 1).astype(np.float32)
        valid = np.array([300, 120, 7, 300, 33], np.int32)
        idx, sam = fps_pallas(xyz, 64, valid=valid, return_xyz=True, interpret=True)
        idx2 = fps_pallas(xyz, 64, valid=valid, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
        np.testing.assert_array_equal(
            np.asarray(sam), np.asarray(index_points(xyz, idx))
        )


class TestUmbrellaPallas:
    """Fused umbrella kernel vs the XLA composition (exact match)."""

    # XLA contracts mul+add chains into FMAs inside fusions; interpreted
    # Pallas does not — transcendental-fed channels (rho/theta/phi, unit
    # normal, const) drift by ~1 ULP while the discrete structure (neighbor
    # extraction order, azimuth sort, repair selection) must agree exactly.
    # Any ordering bug produces O(1) differences, far above this tolerance.
    _ATOL = 2e-6

    def _compare(self, xyz, k, style, **kw):
        from repsurf_tpu.geometry.umbrella import umbrella_features

        a = np.asarray(
            umbrella_features(xyz, k, style=style, impl="pallas", interpret=True, **kw)
        )
        b = np.asarray(umbrella_features(xyz, k, style=style, impl="xla", **kw))
        np.testing.assert_allclose(a, b, atol=self._ATOL, rtol=0)
        return a

    def test_gradient_contract_matches_xla_route(self, rng):
        """The Pallas route's VJP is DEFINED as the XLA composition's VJP
        (geometry/umbrella.py _umbrella_pallas_xla_vjp) — round 3 silently
        stop_gradient'ed the kernel route, a route-dependent semantics trap.
        Both routes must now return the same d(features)/d(xyz)."""
        import jax
        import jax.numpy as jnp

        from repsurf_tpu.geometry.umbrella import umbrella_features

        xyz = (rng.rand(2, 64, 3) * 2 - 1).astype(np.float32)
        w = rng.randn(2, 64, 8, 10).astype(np.float32)

        def scalar(impl):
            def f(x):
                feat = umbrella_features(
                    x, 9, style="cls", impl=impl, interpret=(impl == "pallas")
                )
                return jnp.sum(feat * w)

            return f

        g_pallas = np.asarray(jax.grad(scalar("pallas"))(jnp.asarray(xyz)))
        g_xla = np.asarray(jax.grad(scalar("xla"))(jnp.asarray(xyz)))
        assert np.isfinite(g_pallas).all()
        np.testing.assert_allclose(g_pallas, g_xla, atol=1e-5, rtol=0)
        assert np.abs(g_xla).max() > 1e-3  # gradient actually flows

    def test_cls_style(self, rng):
        xyz = (rng.rand(2, 96, 3) * 2 - 1).astype(np.float32)
        a = self._compare(xyz, 9, "cls")
        assert a.shape == (2, 96, 8, 10)

    def test_seg_style_rotated(self, rng):
        xyz = (rng.rand(2, 80, 3) * 2 - 1).astype(np.float32)
        a = self._compare(xyz, 9, "seg")
        assert a.shape == (2, 80, 9, 10)

    def test_masked_padding(self, rng):
        xyz = (rng.rand(3, 64, 3) * 2 - 1).astype(np.float32)
        valid = np.array([64, 21, 5], np.int32)  # 5 < k: kNN pad slots
        self._compare(xyz, 9, "cls", valid=valid)

    def test_degenerate_fans_repaired(self, rng):
        # many duplicated points => zero-area triangles => repair path
        base = (rng.rand(1, 16, 3) * 2 - 1).astype(np.float32)
        xyz = np.concatenate([base, base, base, base], axis=1)
        a = self._compare(xyz, 9, "cls")
        assert np.isfinite(a).all()

    def test_random_inv_sign(self, rng):
        from repsurf_tpu.geometry.umbrella import umbrella_features

        xyz = (rng.rand(2, 48, 3) * 2 - 1).astype(np.float32)
        sign = np.array([1.0, -1.0], np.float32)
        for style in ("cls", "seg"):
            a = np.asarray(
                umbrella_features(
                    xyz, 9, style=style, impl="pallas", interpret=True,
                    random_inv_sign=sign,
                )
            )
            b = np.asarray(
                umbrella_features(
                    xyz, 9, style=style, impl="xla", random_inv_sign=sign
                )
            )
            np.testing.assert_allclose(a, b, atol=self._ATOL, rtol=0)

    def test_no_dist(self, rng):
        xyz = (rng.rand(2, 40, 3) * 2 - 1).astype(np.float32)
        a = self._compare(xyz, 9, "cls", return_dist=False)
        assert a.shape == (2, 40, 8, 9)

    def test_transposed_kernel_matches_full(self, rng):
        """The queries-on-lanes kernel (impl='tq', the auto route) vs the
        original lane-parallel kernel across styles, rotation, return_dist,
        drop_self and ragged valid counts.  Tolerance _ATOL, not exact:
        XLA-CPU contracts the plane-constant mul+add chain into FMAs
        differently between the two kernel bodies (~1 ULP on the 'posv'
        channel near zero); on TPU hardware the two are bit-identical
        (checked by tools/tpu_smoke.py)."""
        from repsurf_tpu.ops.pallas.umbrella import umbrella_features_pallas

        cases = [
            (2, 40, 9, "cls", False, True, True),
            (1, 100, 9, "seg", True, True, True),
            (2, 64, 9, "cls", False, False, True),
            (3, 33, 7, "seg", True, True, False),
        ]
        for B, N, k, style, rot, rd, ds in cases:
            xyz = (rng.rand(B, N, 3) * 2 - 1).astype(np.float32)
            valid = np.array([N] + [max(4, N // 2)] * (B - 1), np.int32)
            a = np.asarray(
                umbrella_features_pallas(
                    xyz, k, drop_self=ds, rotate=rot, return_dist=rd,
                    style=style, valid=valid, impl="full", interpret=True,
                )
            )
            b = np.asarray(
                umbrella_features_pallas(
                    xyz, k, drop_self=ds, rotate=rot, return_dist=rd,
                    style=style, valid=valid, impl="tq", interpret=True,
                )
            )
            np.testing.assert_allclose(a, b, atol=self._ATOL, rtol=0)

    def test_block_splitting(self, rng):
        from repsurf_tpu.geometry.umbrella import umbrella_features

        xyz = (rng.rand(1, 100, 3) * 2 - 1).astype(np.float32)
        a = np.asarray(
            umbrella_features(
                xyz, 9, style="cls", impl="pallas", interpret=True
            )
        )
        # unaligned N=100 with default blocks already exercises padding; a
        # tiny block_q exercises the grid split
        from repsurf_tpu.ops.pallas.umbrella import umbrella_features_pallas

        c = np.asarray(
            umbrella_features_pallas(
                xyz, 9, drop_self=True, style="cls", block_q=16, interpret=True
            )
        )
        np.testing.assert_array_equal(a, c)


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


class TestGradientInertness:
    """Pallas neighbor/sampling kernels must behave like the reference's
    torch autograd.Functions: constant under autodiff.  Regression for the
    structural-taint crash — centers sliced from a fused gather that also
    returned param-dependent channels carry a (mathematically zero) tangent
    into the kernels, whose JVP rule does not support scratch buffers."""

    def test_grad_through_tainted_cloud(self, rng):
        import jax
        import jax.numpy as jnp

        from repsurf_tpu.geometry.umbrella import umbrella_features
        from repsurf_tpu.ops.pallas.fps import fps_pallas

        x = jnp.asarray((rng.rand(1, 48, 3) * 2 - 1).astype(np.float32))

        def f(w):
            xt = x * w  # param-dependent cloud
            idx = fps_pallas(xt, 8, interpret=True)
            g = jnp.take_along_axis(xt, idx[..., None], axis=1)
            feat = umbrella_features(
                xt, 9, style="cls", impl="pallas", interpret=True
            )
            return jnp.sum(g) + jnp.sum(feat) * 0.0

        g = jax.grad(f)(jnp.float32(2.0))
        assert np.isfinite(float(g))
