"""Model-level tests: shapes, finiteness, parameter-count parity with the
reference's published numbers (BASELINE.md), gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repsurf_tpu.models import get_model


def n_params(variables):
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


class TestClassifier:
    def test_forward_shape_and_logprobs(self, rng):
        model = get_model("repsurf.repsurf_ssg_umb")
        pts = jnp.asarray((rng.rand(2, 128, 3) * 2 - 1).astype(np.float32))
        vars_ = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
        out = model.apply(vars_, pts, train=False)
        assert out.shape == (2, 15)
        # log_softmax rows sum to 1 in prob space
        np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-4)

    def test_param_count_matches_reference(self):
        # classification/README.md:75 — Umbrella RepSurf (SSG): 1.483 M
        model = get_model("repsurf.repsurf_ssg_umb")
        pts = jnp.zeros((1, 32, 3))
        vars_ = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
        count = n_params(vars_)
        assert abs(count / 1e6 - 1.483) < 0.01, f"{count / 1e6:.4f} M"

    def test_param_count_2x(self):
        # classification/README.md:84 — 2x variant: 6.806 M
        model = get_model("repsurf.repsurf_ssg_umb_2x")
        pts = jnp.zeros((1, 32, 3))
        vars_ = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
        count = n_params(vars_)
        assert abs(count / 1e6 - 6.806) < 0.02, f"{count / 1e6:.4f} M"

    def test_train_step_grads_finite(self, rng):
        from repsurf_tpu.nn import smooth_cls_loss

        model = get_model("repsurf.repsurf_ssg_umb")
        pts = jnp.asarray((rng.rand(2, 64, 3) * 2 - 1).astype(np.float32))
        target = jnp.asarray([1, 3])
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0), "random_inv": jax.random.PRNGKey(1)},
            pts,
            train=True,
        )

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                pts,
                train=True,
                rngs={
                    "random_inv": jax.random.PRNGKey(2),
                    "dropout": jax.random.PRNGKey(3),
                },
                mutable=["batch_stats"],
            )
            return smooth_cls_loss(out, target)

        loss, grads = jax.value_and_grad(loss_fn)(vars_["params"])
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # surface constructor receives gradient
        g_sc = jax.tree_util.tree_leaves(grads["surface_constructor"])
        assert any(float(jnp.abs(g).max()) > 0 for g in g_sc)


class TestSegmentor:
    def _inputs(self, rng, B=2, N=256):
        pos = jnp.asarray((rng.rand(B, N, 3) * 2 - 1).astype(np.float32))
        rgb = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
        counts = np.full((B,), N, np.int32)
        counts[1:] = N // 2
        valid = jnp.asarray(counts)
        return pos, rgb, valid

    def test_repsurf_seg_forward(self, rng):
        model = get_model("repsurf.repsurf_umb_ssg")
        pos, rgb, valid = self._inputs(rng)
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0)}, pos, rgb, valid, train=False
        )
        out = model.apply(vars_, pos, rgb, valid, train=False)
        assert out.shape == (2, 256, 13)
        assert np.isfinite(np.asarray(out)).all()

    def test_repsurf_seg_param_count(self, rng):
        # segmentation/README.md:79 — RepSurf-U seg: 0.976 M
        model = get_model("repsurf.repsurf_umb_ssg")
        pos, rgb, valid = self._inputs(rng, B=1, N=64)
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0)}, pos, rgb, valid, train=False
        )
        count = n_params(vars_)
        assert abs(count / 1e6 - 0.976) < 0.01, f"{count / 1e6:.4f} M"

    def test_pointnet2_seg_param_count(self, rng):
        # segmentation/README.md:67 — PointNet++ SSG: 0.968 M
        model = get_model("pointnet2.pointnet2_ssg")
        pos, rgb, valid = self._inputs(rng, B=1, N=64)
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0)}, pos, rgb, valid, train=False
        )
        count = n_params(vars_)
        assert abs(count / 1e6 - 0.968) < 0.01, f"{count / 1e6:.4f} M"

    def test_train_mode_with_sectors(self, rng):
        model = get_model("repsurf.repsurf_umb_ssg")
        pos, rgb, valid = self._inputs(rng, B=2, N=256)
        vars_ = model.init(
            {"params": jax.random.PRNGKey(0), "random_inv": jax.random.PRNGKey(1)},
            pos,
            rgb,
            valid,
            train=True,
        )
        out, _ = model.apply(
            vars_,
            pos,
            rgb,
            valid,
            train=True,
            rngs={
                "random_inv": jax.random.PRNGKey(2),
                "dropout": jax.random.PRNGKey(3),
            },
            mutable=["batch_stats"],
        )
        assert out.shape == (2, 256, 13)
        assert np.isfinite(np.asarray(out)).all()
