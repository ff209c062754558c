"""Tests for NN primitives and RepSurf blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repsurf_tpu.nn import (
    Linear,
    MaskedBatchNorm,
    SurfaceAbstractionCD,
    SurfaceFeaturePropagationCD,
    UmbrellaSurfaceConstructor,
    intersection_and_union,
    iou_from_counts,
    smooth_cls_loss,
    weighted_cross_entropy,
)


class TestMaskedBatchNorm:
    def test_unmasked_normalizes(self, rng):
        x = jnp.asarray(rng.rand(8, 16, 4).astype(np.float32) * 3 + 1)
        bn = MaskedBatchNorm()
        vars_ = bn.init(jax.random.PRNGKey(0), x)
        y, _ = bn.apply(vars_, x, mutable=["batch_stats"])
        y = np.asarray(y)
        np.testing.assert_allclose(y.mean((0, 1)), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std((0, 1)), 1.0, atol=1e-3)

    def test_masked_stats_ignore_padding(self, rng):
        x = rng.rand(2, 10, 4).astype(np.float32)
        x[:, 5:] = 100.0  # padding garbage
        mask = np.zeros((2, 10), bool)
        mask[:, :5] = True
        bn = MaskedBatchNorm()
        vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), mask=jnp.asarray(mask))
        y, state = bn.apply(
            vars_, jnp.asarray(x), mask=jnp.asarray(mask), mutable=["batch_stats"]
        )
        # valid rows normalized w.r.t. valid stats only
        yv = np.asarray(y)[:, :5]
        np.testing.assert_allclose(yv.mean((0, 1)), 0.0, atol=1e-5)
        # running stats track the masked mean, not the garbage
        run_mean = np.asarray(state["batch_stats"]["mean"])
        assert (np.abs(run_mean) < 1.0).all()

    def test_running_average_used_in_eval(self, rng):
        x = jnp.asarray(rng.rand(4, 8, 3).astype(np.float32))
        bn = MaskedBatchNorm()
        vars_ = bn.init(jax.random.PRNGKey(0), x)
        # train step updates stats
        _, state = bn.apply(vars_, x, mutable=["batch_stats"])
        merged = {"params": vars_.get("params", {}), **state}
        y_eval = bn.apply(merged, x, use_running_average=True)
        assert np.isfinite(np.asarray(y_eval)).all()

    def test_torch_momentum_convention(self, rng):
        # after one step: running_mean = 0.9 * 0 + 0.1 * batch_mean
        x = jnp.asarray(rng.rand(16, 3).astype(np.float32) + 5)
        bn = MaskedBatchNorm()
        vars_ = bn.init(jax.random.PRNGKey(0), x)
        _, state = bn.apply(vars_, x, mutable=["batch_stats"])
        got = np.asarray(state["batch_stats"]["mean"])
        want = 0.1 * np.asarray(x).mean(0)
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestLinear:
    def test_shapes_and_init_bound(self, rng):
        x = jnp.asarray(rng.rand(4, 7, 16).astype(np.float32))
        lin = Linear(32)
        vars_ = lin.init(jax.random.PRNGKey(0), x)
        k = np.asarray(vars_["params"]["kernel"])
        assert k.shape == (16, 32)
        bound = 1 / np.sqrt(16)
        assert (np.abs(k) <= bound).all()
        y = lin.apply(vars_, x)
        assert y.shape == (4, 7, 32)


class TestUmbrellaConstructor:
    @pytest.mark.parametrize("style", ["cls", "seg"])
    def test_forward_shapes(self, rng, style):
        xyz = jnp.asarray((rng.rand(2, 48, 3) * 2 - 1).astype(np.float32))
        mod = UmbrellaSurfaceConstructor(k=9, in_channel=10, style=style)
        vars_ = mod.init(
            {"params": jax.random.PRNGKey(0), "random_inv": jax.random.PRNGKey(1)},
            xyz,
        )
        out, _ = mod.apply(
            vars_,
            xyz,
            rngs={"random_inv": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        assert out.shape == (2, 48, 10)
        assert np.isfinite(np.asarray(out)).all()

    def test_no_rng_is_deterministic(self, rng):
        xyz = jnp.asarray((rng.rand(1, 32, 3) * 2 - 1).astype(np.float32))
        mod = UmbrellaSurfaceConstructor(k=9, in_channel=10, style="cls")
        vars_ = mod.init({"params": jax.random.PRNGKey(0)}, xyz)
        a, _ = mod.apply(vars_, xyz, mutable=["batch_stats"])
        b, _ = mod.apply(vars_, xyz, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_masked_input_finite(self, rng):
        xyz = (rng.rand(2, 40, 3) * 2 - 1).astype(np.float32)
        xyz[1, 20:] = 7.7  # padding garbage
        valid = jnp.asarray(np.array([40, 20], np.int32))
        mod = UmbrellaSurfaceConstructor(k=9, in_channel=10, style="seg")
        vars_ = mod.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(xyz), valid)
        out, _ = mod.apply(vars_, jnp.asarray(xyz), valid, mutable=["batch_stats"])
        assert np.isfinite(np.asarray(out)).all()


class TestSurfaceAbstractionCD:
    def test_cls_style(self, rng):
        center = jnp.asarray((rng.rand(2, 64, 3) * 2 - 1).astype(np.float32))
        normal = jnp.asarray(rng.rand(2, 64, 10).astype(np.float32))
        mod = SurfaceAbstractionCD(
            npoint=16,
            radius=0.4,
            nsample=8,
            pos_channel=6,
            mlp=(32, 32, 64),
            grouping="ball",
            return_polar=True,
        )
        vars_ = mod.init(jax.random.PRNGKey(0), center, normal, None)
        (nc, nn_, nf, nv), _ = mod.apply(
            vars_, center, normal, None, mutable=["batch_stats"]
        )
        assert nc.shape == (2, 16, 3)
        assert nn_.shape == (2, 16, 10)
        assert nf.shape == (2, 16, 64)
        assert nv is None

    def test_seg_style_stride(self, rng):
        center = jnp.asarray((rng.rand(2, 64, 3) * 2 - 1).astype(np.float32))
        normal = jnp.asarray(rng.rand(2, 64, 10).astype(np.float32))
        feat = jnp.asarray(rng.rand(2, 64, 6).astype(np.float32))
        valid = jnp.asarray(np.array([64, 33], np.int32))
        mod = SurfaceAbstractionCD(
            stride=4,
            nsample=8,
            pos_channel=3,
            mlp=(16, 16, 32),
            grouping="knn",
        )
        vars_ = mod.init(jax.random.PRNGKey(0), center, normal, feat, valid)
        (nc, nn_, nf, nv), _ = mod.apply(
            vars_, center, normal, feat, valid, mutable=["batch_stats"]
        )
        assert nc.shape == (2, 16, 3)
        assert nf.shape == (2, 16, 32)
        np.testing.assert_array_equal(np.asarray(nv), [16, 8])

    def test_group_all(self, rng):
        center = jnp.asarray((rng.rand(2, 32, 3)).astype(np.float32))
        normal = jnp.asarray(rng.rand(2, 32, 10).astype(np.float32))
        feat = jnp.asarray(rng.rand(2, 32, 16).astype(np.float32))
        mod = SurfaceAbstractionCD(
            npoint=1,
            pos_channel=6,
            mlp=(32, 64),
            group_all=True,
            return_polar=True,
        )
        vars_ = mod.init(jax.random.PRNGKey(0), center, normal, feat)
        (nc, _, nf, _), _ = mod.apply(
            vars_, center, normal, feat, mutable=["batch_stats"]
        )
        assert nc.shape == (2, 1, 3)
        assert nf.shape == (2, 1, 64)


class TestFeaturePropagation:
    def test_fp_cd(self, rng):
        xyz1 = jnp.asarray(rng.rand(2, 40, 3).astype(np.float32))
        xyz2 = jnp.asarray(rng.rand(2, 10, 3).astype(np.float32))
        f1 = jnp.asarray(rng.rand(2, 40, 8).astype(np.float32))
        f2 = jnp.asarray(rng.rand(2, 10, 16).astype(np.float32))
        mod = SurfaceFeaturePropagationCD(mlp=(24, 24))
        vars_ = mod.init(jax.random.PRNGKey(0), xyz1, f1, xyz2, f2)
        out, _ = mod.apply(vars_, xyz1, f1, xyz2, f2, mutable=["batch_stats"])
        assert out.shape == (2, 40, 24)

    def test_fp_no_skip(self, rng):
        xyz1 = jnp.asarray(rng.rand(1, 20, 3).astype(np.float32))
        xyz2 = jnp.asarray(rng.rand(1, 5, 3).astype(np.float32))
        f2 = jnp.asarray(rng.rand(1, 5, 16).astype(np.float32))
        mod = SurfaceFeaturePropagationCD(mlp=(8, 8, 8), skip=False)
        vars_ = mod.init(jax.random.PRNGKey(0), xyz1, None, xyz2, f2)
        out, _ = mod.apply(vars_, xyz1, None, xyz2, f2, mutable=["batch_stats"])
        assert out.shape == (1, 20, 8)


class TestLosses:
    def test_smooth_cls_matches_manual(self, rng):
        logp = jax.nn.log_softmax(jnp.asarray(rng.rand(4, 5).astype(np.float32)))
        target = jnp.asarray([0, 1, 2, 3])
        got = float(smooth_cls_loss(logp, target))
        eps = 0.1
        lp = np.asarray(logp)
        oh = np.eye(5)[np.asarray(target)]
        sm = oh * (1 - eps) + (1 - oh) * eps / 4
        want = float(-(sm * lp).sum(1).mean())
        assert abs(got - want) < 1e-6

    def test_weighted_ce_ignores(self, rng):
        logits = jnp.asarray(rng.rand(6, 3).astype(np.float32))
        target = jnp.asarray([0, 1, 2, 255, 255, 1])
        w = jnp.asarray([1.0, 2.0, 0.5])
        got = float(weighted_cross_entropy(logits, target, w, ignore_index=255))
        lp = np.asarray(jax.nn.log_softmax(logits))
        keep = [0, 1, 2, 5]
        t = [0, 1, 2, 1]
        wt = np.array([1.0, 2.0, 0.5, 2.0])
        want = float((-lp[keep, t] * wt).sum() / wt.sum())
        assert abs(got - want) < 1e-5

    def test_all_ignored_is_finite(self):
        logits = jnp.ones((3, 4))
        target = jnp.full((3,), 255)
        assert np.isfinite(float(weighted_cross_entropy(logits, target)))


class TestMetrics:
    def test_iou_counts(self):
        pred = jnp.asarray([0, 0, 1, 1, 2])
        target = jnp.asarray([0, 1, 1, 1, 255])
        inter, union, tgt = intersection_and_union(pred, target, 3, 255)
        np.testing.assert_array_equal(np.asarray(inter), [1, 2, 0])
        np.testing.assert_array_equal(np.asarray(tgt), [1, 3, 0])
        np.testing.assert_array_equal(np.asarray(union), [2, 3, 0])
        miou, macc, allacc = iou_from_counts(inter, union, tgt)
        assert 0 <= float(miou) <= 1
        assert abs(float(allacc) - 0.75) < 1e-6
