"""Multi-device tests on the 8-virtual-CPU mesh — the capability the
reference lacks entirely (its DDP path needs >= 2 physical GPUs,
SURVEY.md §4): sharded training steps must produce the same math as
single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repsurf_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)
from repsurf_tpu.train import train_seg


def _seg_batch(rng, B, N=256, C=13):
    from repsurf_tpu.data.s3dis import pad_batch

    samples = []
    for b in range(B):
        n = N - (b * 17) % 50
        coord = rng.randn(n, 3).astype(np.float32)
        feat = rng.rand(n, 3).astype(np.float32)
        label = rng.randint(0, C, n).astype(np.int64)
        samples.append((coord, feat, label))
    return pad_batch(samples, N)


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("data",)

    def test_pad_to_multiple(self, rng):
        batch = _seg_batch(rng, 3)
        out = pad_to_multiple(batch, 4)
        assert out["coord"].shape[0] == 4
        assert out["valid"][3] == 0
        assert (out["label"][3] == 255).all()


class TestShardedTraining:
    @pytest.fixture(scope="class")
    def cfg(self):
        return train_seg.SegConfig(voxel_max=256, batch_size=8, num_sector=2)

    def test_dp_step_runs_on_8_devices(self, cfg, rng):
        mesh = make_mesh(8)
        state = train_seg.create_state(cfg, n_points=256, key=jax.random.PRNGKey(0))
        state = replicate(state, mesh)
        batch = _seg_batch(rng, 8)
        batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        w = replicate(jnp.ones((cfg.num_class,), jnp.float32), mesh)
        key = replicate(jax.random.PRNGKey(1), mesh)
        state, loss, (inter, union, target) = train_seg.train_step(
            state, batch, w, key, cfg
        )
        assert np.isfinite(float(loss))
        # params stay replicated across all devices
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_sharded_matches_single_device(self, cfg, rng):
        """The sharded step must compute the same numbers as the unsharded
        one — SyncBN semantics hold by construction under jit sharding."""
        batch_np = _seg_batch(rng, 8)
        w = jnp.ones((cfg.num_class,), jnp.float32)
        key = jax.random.PRNGKey(3)

        state1 = train_seg.create_state(cfg, n_points=256, key=jax.random.PRNGKey(0))
        batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
        _, loss1, counts1 = train_seg.train_step(state1, batch1, w, key, cfg)

        mesh = make_mesh(8)
        state8 = train_seg.create_state(cfg, n_points=256, key=jax.random.PRNGKey(0))
        state8 = replicate(state8, mesh)
        batch8 = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()}, mesh)
        _, loss8, counts8 = train_seg.train_step(
            state8, batch8, replicate(w, mesh), replicate(key, mesh), cfg
        )

        np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-4)
        np.testing.assert_allclose(
            np.asarray(counts1[0]), np.asarray(counts8[0]), atol=2
        )


class TestShardMapPerDeviceBN:
    """shard_map steps: the reference's DEFAULT (unsynchronized) BatchNorm —
    per-device statistics, DDP-averaged gradients, per-process RNG."""

    @pytest.fixture(scope="class")
    def cfg(self):
        return train_seg.SegConfig(voxel_max=128, batch_size=8, num_sector=2)

    def _inputs(self, cfg, rng, B=8, N=128):
        batch = {k: jnp.asarray(v) for k, v in _seg_batch(rng, B, N=N).items()}
        w = jnp.ones((cfg.num_class,), jnp.float32)
        return batch, w

    def test_per_device_bn_runs_and_stats_diverge(self, cfg, rng):
        from repsurf_tpu.parallel.shard_step import (
            make_seg_train_step,
            stack_batch_stats,
        )

        mesh = make_mesh(8)
        state = train_seg.create_state(cfg, n_points=128, key=jax.random.PRNGKey(0))
        stats8 = stack_batch_stats(state.batch_stats, 8)
        batch, w = self._inputs(cfg, rng)
        step = make_seg_train_step(cfg, mesh, bn="per_device")
        params, opt_state, stats8, loss, (inter, union, target) = step(
            state.params, state.opt_state, stats8, batch, w, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(loss))
        assert jax.tree_util.tree_leaves(params)[0].sharding.is_fully_replicated
        # per-device buffers: different data shards => different running
        # means on at least one BN
        means = [
            np.asarray(x)
            for x in jax.tree_util.tree_leaves(stats8)
            if x.ndim >= 2
        ]
        assert any((np.ptp(m, axis=0) > 1e-7).any() for m in means)

    def test_sync_mode_matches_jit_global_bn(self, cfg, rng):
        """bn='sync' on a 1-device mesh must reproduce the jit step (same
        RNG stream once the axis fold-in is accounted for)."""
        from repsurf_tpu.parallel.shard_step import (
            make_seg_train_step,
            stack_batch_stats,
            unstack_batch_stats,
        )

        batch, w = self._inputs(cfg, rng)
        key = jax.random.PRNGKey(5)
        state = train_seg.create_state(cfg, n_points=128, key=jax.random.PRNGKey(0))

        folded = jax.random.fold_in(key, 0)
        # train_step donates its state: hand it a copy so the original
        # buffers stay alive for the shard_map call below
        state_copy = jax.tree_util.tree_map(jnp.copy, state)
        state1, loss1, _ = train_seg.train_step(state_copy, batch, w, folded, cfg)

        mesh = make_mesh(1)
        step = make_seg_train_step(cfg, mesh, bn="sync")
        params, _, stats, loss2, _ = step(
            state.params,
            state.opt_state,
            stack_batch_stats(state.batch_stats, 1),
            batch,
            w,
            key,
        )
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        a = jax.tree_util.tree_leaves(state1.params)
        b = jax.tree_util.tree_leaves(params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
        s1 = jax.tree_util.tree_leaves(state1.batch_stats)
        s2 = jax.tree_util.tree_leaves(unstack_batch_stats(stats, 0))
        for x, y in zip(s1, s2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)

    def test_cls_dataparallel_step(self, rng):
        from repsurf_tpu.parallel.shard_step import (
            make_cls_train_step,
            stack_batch_stats,
        )
        from repsurf_tpu.train import train_cls

        cfg = train_cls.ClsConfig(num_point=64, batch_size=8)
        mesh = make_mesh(8)
        state = train_cls.create_state(cfg, key=jax.random.PRNGKey(0))
        stats8 = stack_batch_stats(state.batch_stats, 8)
        pts = jnp.asarray(rng.randn(8, 128, 3).astype(np.float32))
        lbl = jnp.asarray(rng.randint(0, cfg.num_class, 8).astype(np.int32))
        step = make_cls_train_step(cfg, mesh)
        params, opt_state, stats8, loss, correct = step(
            state.params, state.opt_state, stats8, pts, lbl, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(loss))
        assert 0 <= int(correct) <= 8
        assert jax.tree_util.tree_leaves(params)[0].sharding.is_fully_replicated
