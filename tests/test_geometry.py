"""Tests for the geometry library (polar transforms, surfaces, umbrella)."""

import numpy as np

from repsurf_tpu import geometry, ops
from tests import oracles


class TestPolar:
    def test_xyz2sphere_matches_oracle(self, rng):
        xyz = (rng.rand(2, 20, 3) * 2 - 1).astype(np.float32)
        got = np.asarray(geometry.xyz2sphere(xyz))
        want = oracles.xyz2sphere_oracle(xyz)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_xyz2sphere_zero_guard(self):
        xyz = np.zeros((1, 3, 3), dtype=np.float32)
        got = np.asarray(geometry.xyz2sphere(xyz))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got[..., 0], 0.0)  # rho
        np.testing.assert_allclose(got[..., 1], 0.0)  # theta guard
        np.testing.assert_allclose(got[..., 2], 0.5)  # phi = atan2(0,0) -> 0.5

    def test_ranges(self, rng):
        xyz = (rng.rand(4, 50, 3) * 4 - 2).astype(np.float32)
        out = np.asarray(geometry.xyz2sphere(xyz))
        assert (out[..., 1] >= 0).all() and (out[..., 1] <= 1).all()
        assert (out[..., 2] >= 0).all() and (out[..., 2] <= 1).all()

    def test_xyz2cylind_finite(self, rng):
        xyz = (rng.rand(2, 9, 3) * 2 - 1).astype(np.float32)
        out = np.asarray(geometry.xyz2cylind(xyz))
        assert np.isfinite(out).all()


class TestSurface:
    def test_normal_matches_oracle(self, rng):
        tri = (rng.rand(2, 12, 5, 3, 3) * 2 - 1).astype(np.float32)
        got, bad = geometry.cal_normal(tri, is_group=True)
        want, wbad = oracles.normal_oracle(tri, is_group=True)
        assert not np.asarray(bad).any() and not wbad.any()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_normal_unit_and_sign(self, rng):
        tri = (rng.rand(3, 8, 4, 3, 3) * 2 - 1).astype(np.float32)
        nor, _ = geometry.cal_normal(tri, is_group=True)
        nor = np.asarray(nor)
        np.testing.assert_allclose(np.linalg.norm(nor, axis=-1), 1.0, rtol=1e-4)
        # sign convention: fan 0's x-component decides the point's sign
        assert (nor[..., 0, 0] >= 0).all()

    def test_degenerate_flagged_and_finite(self):
        tri = np.zeros((1, 2, 3, 3, 3), dtype=np.float32)  # all-zero triangles
        nor, bad = geometry.cal_normal(tri, is_group=True)
        assert np.asarray(bad).all()
        assert np.isfinite(np.asarray(nor)).all()

    def test_random_inv_sign(self, rng):
        tri = (rng.rand(2, 6, 3, 3, 3) * 2 - 1).astype(np.float32)
        base, _ = geometry.cal_normal(tri, is_group=True)
        inv = np.array([1.0, -1.0], dtype=np.float32)
        flipped, _ = geometry.cal_normal(tri, random_inv_sign=inv, is_group=True)
        np.testing.assert_allclose(np.asarray(flipped)[0], np.asarray(base)[0])
        np.testing.assert_allclose(np.asarray(flipped)[1], -np.asarray(base)[1])

    def test_center_and_const(self, rng):
        tri = (rng.rand(2, 5, 4, 3, 3)).astype(np.float32)
        center = np.asarray(geometry.cal_center(tri))
        np.testing.assert_allclose(center, tri.mean(-2), rtol=1e-6)
        nor, _ = geometry.cal_normal(tri, is_group=True)
        const = np.asarray(geometry.cal_const(nor, center))
        want = (np.asarray(nor) * center).sum(-1, keepdims=True) / np.sqrt(3)
        np.testing.assert_allclose(const, want, rtol=1e-5, atol=1e-6)

    def test_cal_area_triangle(self):
        # right triangle in the xy-plane with legs 1,1: true area 0.5, but the
        # reference formula returns twice the area (homogeneous det = 2A) —
        # we preserve that quirk.
        tri = np.array(
            [[[[0, 0, 0], [1, 0, 0], [0, 1, 0]]]], dtype=np.float32
        )  # [1,1,3,3]
        area = np.asarray(geometry.cal_area(tri))
        np.testing.assert_allclose(area, 1.0, rtol=1e-5)

    def test_repair_invalid_group(self, rng):
        nor = rng.rand(1, 2, 4, 3).astype(np.float32)
        cen = rng.rand(1, 2, 4, 3).astype(np.float32)
        bad = np.zeros((1, 2, 4), dtype=bool)
        bad[0, 0, 0] = True
        bad[0, 0, 2] = True
        rn, rc = geometry.repair_invalid_group(bad, nor, cen)
        rn, rc = np.asarray(rn), np.asarray(rc)
        # fan 1 is the first valid; bad fans 0 and 2 copy it
        np.testing.assert_allclose(rn[0, 0, 0], nor[0, 0, 1])
        np.testing.assert_allclose(rn[0, 0, 2], nor[0, 0, 1])
        np.testing.assert_allclose(rn[0, 0, 1], nor[0, 0, 1])
        np.testing.assert_allclose(rc[0, 0, 0], cen[0, 0, 1])
        np.testing.assert_allclose(rn[0, 1], nor[0, 1])

    def test_repair_all_bad_uses_fan0(self, rng):
        nor = rng.rand(1, 1, 3, 3).astype(np.float32)
        bad = np.ones((1, 1, 3), dtype=bool)
        (rn,) = geometry.repair_invalid_group(bad, nor)
        np.testing.assert_allclose(np.asarray(rn), nor[:, :, :1].repeat(3, 2))


class TestUmbrella:
    def test_fan_shape_and_centroid(self, rng):
        xyz = (rng.rand(2, 40, 3) * 2 - 1).astype(np.float32)
        fans = np.asarray(geometry.group_by_umbrella(xyz, xyz, k=9, drop_self=True))
        assert fans.shape == (2, 40, 8, 3, 3)
        np.testing.assert_allclose(fans[..., 0, :], 0.0)  # vertex 0 = centroid

    def test_seg_variant_keeps_self(self, rng):
        xyz = (rng.rand(1, 30, 3) * 2 - 1).astype(np.float32)
        fans = np.asarray(geometry.group_by_umbrella(xyz, xyz, k=9, drop_self=False))
        assert fans.shape == (1, 30, 9, 3, 3)
        # self point appears as a zero-coordinate vertex in some fan
        v1 = fans[..., 1, :]  # [1, 30, 9, 3]
        has_zero = (np.abs(v1) < 1e-7).all(-1).any(-1)
        assert has_zero.all()

    def test_sorted_by_phi(self, rng):
        xyz = (rng.rand(1, 25, 3) * 2 - 1).astype(np.float32)
        fans = np.asarray(geometry.group_by_umbrella(xyz, xyz, k=7, drop_self=True))
        v1 = fans[0, :, :, 1, :]  # sorted neighbor coords
        phi = np.arctan2(v1[..., 1], v1[..., 0])
        assert (np.diff(phi, axis=-1) >= -1e-6).all()

    def test_roll_pairs_successive_neighbors(self, rng):
        xyz = (rng.rand(1, 20, 3) * 2 - 1).astype(np.float32)
        fans = np.asarray(geometry.group_by_umbrella(xyz, xyz, k=5, drop_self=True))
        # fan i's vertex2 == fan i+1's vertex1 (cyclic)
        np.testing.assert_allclose(
            fans[0, :, :-1, 2, :], fans[0, :, 1:, 1, :], rtol=1e-6
        )
        np.testing.assert_allclose(fans[0, :, -1, 2, :], fans[0, :, 0, 1, :], rtol=1e-6)

    def test_fixed_rotation_is_rotation(self):
        # the matrix reproduces the reference's truncated 0.7071 literals
        # (segmentation/modules/repsurface_utils.py:73), so it is a rotation
        # only to literal precision (~2e-5)
        m = np.asarray(geometry.fixed_rotation_matrix())
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, rtol=1e-4)

    def test_v2_differs_from_v1(self, rng):
        xyz = (rng.rand(1, 30, 3) * 2 - 1).astype(np.float32)
        a = np.asarray(geometry.group_by_umbrella(xyz, xyz, k=9))
        b = np.asarray(
            geometry.group_by_umbrella(
                xyz, xyz, k=9, sort_rotation=geometry.fixed_rotation_matrix()
            )
        )
        assert not np.allclose(a, b)
        # same fan *sets*, different order: sort vertices to compare
        np.testing.assert_allclose(
            np.sort(a[0, :, :, 1, 0], axis=-1),
            np.sort(b[0, :, :, 1, 0], axis=-1),
            rtol=1e-5,
        )
