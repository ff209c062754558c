"""Adversarial-input robustness: degenerate geometry must never produce
NaN/Inf anywhere (the reference repairs NaNs after the fact; we guard the
constructions — SURVEY.md §7 hard part 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repsurf_tpu import geometry, ops
from repsurf_tpu.models import get_model


def _finite(x):
    return bool(np.isfinite(np.asarray(x)).all())


class TestDegenerateGeometry:
    def test_all_identical_points(self):
        xyz = jnp.ones((1, 64, 3))
        model = get_model("repsurf.repsurf_ssg_umb")
        vars_ = model.init({"params": jax.random.PRNGKey(0)}, xyz, train=False)
        assert _finite(model.apply(vars_, xyz, train=False))

    def test_many_duplicates(self, rng):
        base = (rng.rand(16, 3) * 2 - 1).astype(np.float32)
        xyz = jnp.asarray(np.tile(base, (8, 1))[None])  # every point x8
        model = get_model("repsurf.repsurf_ssg_umb")
        vars_ = model.init({"params": jax.random.PRNGKey(0)}, xyz, train=False)
        assert _finite(model.apply(vars_, xyz, train=False))

    def test_collinear_cloud(self, rng):
        t = rng.rand(1, 128, 1).astype(np.float32)
        xyz = jnp.asarray(np.concatenate([t, 2 * t, 3 * t], axis=-1))  # a line
        model = get_model("repsurf.repsurf_ssg_umb")
        vars_ = model.init({"params": jax.random.PRNGKey(0)}, xyz, train=False)
        assert _finite(model.apply(vars_, xyz, train=False))

    def test_planar_cloud_seg(self, rng):
        xy = rng.rand(1, 256, 2).astype(np.float32)
        xyz = jnp.asarray(np.concatenate([xy, np.zeros((1, 256, 1), np.float32)], -1))
        rgb = jnp.asarray(rng.rand(1, 256, 3).astype(np.float32))
        valid = jnp.full((1,), 256, jnp.int32)
        model = get_model("repsurf.repsurf_umb_ssg")
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0)}, xyz, rgb, valid, train=False
        )
        assert _finite(model.apply(vars_, xyz, rgb, valid, train=False))

    def test_degenerate_grads_finite(self, rng):
        # gradients through repaired degenerate fans must stay finite — the
        # reference's NaN round-trip poisons backward here
        base = (rng.rand(8, 3) * 2 - 1).astype(np.float32)
        xyz = jnp.asarray(np.tile(base, (8, 1))[None])
        from repsurf_tpu.nn.blocks import UmbrellaSurfaceConstructor

        mod = UmbrellaSurfaceConstructor(k=9, in_channel=10, style="cls")
        vars_ = mod.init({"params": jax.random.PRNGKey(0)}, xyz)

        def loss(x):
            out, _ = mod.apply(vars_, x, mutable=["batch_stats"])
            return jnp.sum(out**2)

        g = jax.grad(loss)(xyz)
        assert _finite(g)

    def test_single_valid_point(self, rng):
        xyz = jnp.asarray((rng.rand(2, 64, 3)).astype(np.float32))
        valid = jnp.asarray(np.array([64, 1], np.int32))
        idx, dist = ops.knn(5, xyz, xyz, valid=valid)
        assert _finite(dist)
        assert (np.asarray(idx)[1] == 0).all()  # only point 0 exists

    def test_zero_radius_ball(self, rng):
        xyz = jnp.asarray((rng.rand(1, 32, 3)).astype(np.float32))
        idx = ops.ball_query(0.0, 4, xyz, xyz)
        # only the point itself is within radius 0
        np.testing.assert_array_equal(
            np.asarray(idx), np.tile(np.arange(32)[None, :, None], (1, 1, 4))
        )

    def test_huge_coordinates(self, rng):
        xyz = jnp.asarray((rng.rand(1, 64, 3) * 1e4).astype(np.float32))
        fans = geometry.group_by_umbrella(xyz, xyz, k=9, drop_self=True)
        normal, bad = geometry.cal_normal(fans, is_group=True)
        assert _finite(normal)
