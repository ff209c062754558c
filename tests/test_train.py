"""Trainer tests: fixed-seed micro-training runs on synthetic clouds
asserting the loss trajectory (SURVEY.md §4 plan (b)), LR schedules,
freezing, and vote evaluation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repsurf_tpu.data.scanobjectnn import SyntheticClouds
from repsurf_tpu.train import optim, train_cls, train_seg


class TestSchedules:
    def test_step_lr_prestep_quirk(self):
        # reference calls scheduler.step() before each epoch's batches:
        # epoch 19 already runs at the decayed rate
        lr = optim.step_lr(1e-3, decay_step=20, gamma=0.7)
        assert lr(0) == 1e-3
        assert lr(18) == 1e-3
        assert abs(lr(19) - 7e-4) < 1e-12
        assert abs(lr(39) - 4.9e-4) < 1e-12

    def test_multistep_lr(self):
        lr = optim.multistep_lr(6e-3, (60, 80), 0.1)
        assert lr(0) == 6e-3
        assert lr(59) == 6e-3
        assert abs(lr(60) - 6e-4) < 1e-12
        assert abs(lr(80) - 6e-5) < 1e-12

    def test_set_lr_changes_updates(self):
        tx = optim.make_adam(1e-3)
        params = {"w": jnp.ones(3)}
        st = tx.init(params)
        st = optim.set_lr(st, 1e-1)
        upd, _ = tx.update({"w": jnp.ones(3)}, st, params)
        assert float(jnp.abs(upd["w"]).max()) > 1e-3  # big lr -> big step


class TestClsTrainer:
    @pytest.fixture(scope="class")
    def cfg(self):
        return train_cls.ClsConfig(num_point=64, batch_size=8, num_votes=3)

    def test_micro_training_reduces_loss(self, cfg):
        # 16 samples x 3 epochs: enough for a monotone-ish loss drop while
        # keeping the single-core CPU runtime bounded (each jitted step is
        # seconds on this host)
        ds = SyntheticClouds(n_samples=16, n_points=128, seed=0)
        state = train_cls.create_state(cfg, key=jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        rng = np.random.RandomState(0)
        state, loss0, _ = train_cls.train_epoch(state, ds, cfg, 0, key, rng=rng)
        losses = [loss0]
        for e in range(1, 3):
            state, loss, acc = train_cls.train_epoch(
                state, ds, cfg, e, jax.random.fold_in(key, e), rng=rng
            )
            losses.append(loss)
        assert losses[-1] < losses[0], losses

    def test_vote_eval_runs(self, cfg):
        ds = SyntheticClouds(n_samples=16, n_points=128, seed=1)
        state = train_cls.create_state(cfg, key=jax.random.PRNGKey(0))
        sing, vote = train_cls.evaluate(state, ds, cfg, jax.random.PRNGKey(2))
        assert 0.0 <= sing <= 1.0
        assert 0.0 <= vote <= 1.0


def _seg_batch(rng, B=2, N=256, C=13):
    from repsurf_tpu.data.s3dis import pad_batch

    samples = []
    for b in range(B):
        n = N if b % 2 == 0 else N - 40
        coord = rng.randn(n, 3).astype(np.float32)
        feat = rng.rand(n, 3).astype(np.float32)
        label = rng.randint(0, C, n).astype(np.int64)
        samples.append((coord, feat, label))
    return pad_batch(samples, N)


class TestSegTrainer:
    @pytest.fixture(scope="class")
    def cfg(self):
        return train_seg.SegConfig(voxel_max=256, batch_size=2, num_sector=2)

    @pytest.fixture(scope="class")
    def _base_state(self, cfg):
        return train_seg.create_state(cfg, n_points=256, key=jax.random.PRNGKey(0))

    @pytest.fixture
    def state(self, _base_state):
        # train_step donates its state argument — hand each test a fresh copy
        return jax.tree_util.tree_map(jnp.copy, _base_state)

    def test_steps_reduce_loss(self, cfg, state, rng):
        batch = {k: jnp.asarray(v) for k, v in _seg_batch(rng).items()}
        w = jnp.ones((cfg.num_class,), jnp.float32)
        losses = []
        for i in range(6):
            state, loss, _ = train_seg.train_step(
                state, batch, w, jax.random.PRNGKey(i), cfg
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses

    def test_freeze_keeps_constructor_params(self, cfg, state, rng):
        batch = {k: jnp.asarray(v) for k, v in _seg_batch(rng).items()}
        w = jnp.ones((cfg.num_class,), jnp.float32)
        before = jax.tree_util.tree_map(
            jnp.copy, state.params["surface_constructor"]
        )
        other_before = jax.tree_util.tree_map(jnp.copy, state.params["sa1"])
        new_state, _, _ = train_seg.train_step(
            state, batch, w, jax.random.PRNGKey(0), cfg, freeze=True
        )
        after = new_state.params["surface_constructor"]
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # but other params moved
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(other_before),
                jax.tree_util.tree_leaves(new_state.params["sa1"]),
            )
        )
        assert moved

    def test_is_frozen_condition(self):
        cfg = train_seg.SegConfig(freeze_epoch=10)
        assert not train_seg.is_frozen(cfg, 9)  # epoch index 9 -> epoch 10
        assert train_seg.is_frozen(cfg, 10)

    def test_eval_step(self, cfg, state, rng):
        batch = {k: jnp.asarray(v) for k, v in _seg_batch(rng).items()}
        w = jnp.ones((cfg.num_class,), jnp.float32)
        loss, pred, (inter, union, target) = train_seg.eval_step(
            state, batch, w, cfg
        )
        assert np.isfinite(float(loss))
        assert pred.shape == batch["label"].shape
        # padded rows contribute nothing to the counters
        assert float(np.asarray(target).sum()) == float(
            np.asarray(batch["valid"]).sum()
        )


class TestCheckpointResume:
    def test_full_state_roundtrip(self, tmp_path, rng):
        from repsurf_tpu.train.checkpoint import (
            BestCheckpointer,
            apply_train_state,
            train_state_dict,
        )

        cfg = train_cls.ClsConfig(num_point=64, batch_size=4)
        state = train_cls.create_state(cfg, key=jax.random.PRNGKey(0))
        # advance one step so the optimizer state is non-trivial
        pts = jnp.asarray(rng.randn(4, 128, 3).astype(np.float32))
        tgt = jnp.asarray([0, 1, 2, 3])
        state, _, _ = train_cls.train_step(state, pts, tgt, jax.random.PRNGKey(1), cfg)

        ckpt = BestCheckpointer(str(tmp_path / "ck"))
        assert ckpt.maybe_save(0.5, 3, train_state_dict(state, 3, 0.5))

        fresh = train_cls.create_state(cfg, key=jax.random.PRNGKey(9))
        restored = ckpt.restore(train_state_dict(fresh))
        fresh, epoch, best = apply_train_state(fresh, restored)
        assert epoch == 3 and abs(best - 0.5) < 1e-9
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(fresh.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.opt_state),
            jax.tree_util.tree_leaves(fresh.opt_state),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_weights_only(self, tmp_path, rng):
        from repsurf_tpu.train.checkpoint import (
            BestCheckpointer,
            apply_train_state,
            train_state_dict,
        )

        cfg = train_cls.ClsConfig(num_point=64, batch_size=4)
        state = train_cls.create_state(cfg, key=jax.random.PRNGKey(0))
        ckpt = BestCheckpointer(str(tmp_path / "ck2"))
        ckpt.maybe_save(0.7, 5, train_state_dict(state, 5, 0.7))
        fresh = train_cls.create_state(cfg, key=jax.random.PRNGKey(9))
        restored = ckpt.restore(train_state_dict(fresh))
        fresh, epoch, best = apply_train_state(fresh, restored, weights_only=True)
        assert epoch == 0 and best == 0.0  # --pretrain semantics


class TestScanNetProtocol:
    """ScanNet wiring: ignore-0 labels + the argmax remap (never predict
    class 0 — reference tool/train.py:458-468)."""

    @pytest.fixture(scope="class")
    def cfg(self):
        return train_seg.SegConfig(
            num_class=21,
            ignore_label=0,
            pred_ignore0=True,
            voxel_max=128,
            batch_size=2,
            num_sector=2,
        )

    def test_micro_train_never_predicts_zero(self, cfg, rng):
        state = train_seg.create_state(cfg, n_points=128, key=jax.random.PRNGKey(0))
        w = jnp.ones((cfg.num_class,), jnp.float32)
        samples = []
        for b in range(2):
            n = 128 - 13 * b
            coord = rng.randn(n, 3).astype(np.float32)
            feat = rng.rand(n, 3).astype(np.float32)
            label = rng.randint(0, cfg.num_class, n).astype(np.int64)
            samples.append((coord, feat, label))
        from repsurf_tpu.data.s3dis import pad_batch

        batch = {
            k: jnp.asarray(v)
            for k, v in pad_batch(samples, 128, ignore_index=0).items()
        }
        losses = []
        for i in range(4):
            state, loss, _ = train_seg.train_step(
                state, batch, w, jax.random.PRNGKey(i), cfg
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        _, pred, (inter, union, target) = train_seg.eval_step(
            state, batch, w, cfg
        )
        pred = np.asarray(pred)
        assert (pred >= 1).all() and (pred <= 20).all()
        # class 0 (unannotated) contributes nothing to the counters
        assert float(np.asarray(target)[0]) == 0.0
