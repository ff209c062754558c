"""shard_map training steps: per-device BatchNorm + DDP-style collectives.

The jit-sharded path in train_seg/train_cls computes batch-norm statistics
over the GLOBAL batch (SyncBatchNorm semantics by construction).  The
reference's *default* is the opposite: without ``--sync_bn`` every
DDP process normalizes with its own shard's statistics and keeps its own
running buffers (segmentation/tool/train.py:141-146), and the
classification DataParallel wrapper does the same per replica
(classification/tool/train_cls_scanobjectnn.py:163).  This module provides
that mode faithfully:

  * the step runs under ``jax.shard_map`` — inside, every device sees only
    its batch shard, so unsynchronized BN is per-device by construction;
  * gradients are ``pmean``-ed across the mesh before the optimizer update
    (DDP's gradient averaging), keeping params bit-identical on every
    device without an explicit broadcast;
  * the loss is ``pmean``-ed and the IoU counters ``psum``-ed (the explicit
    ``dist.all_reduce`` calls at tool/train.py:293-303);
  * BN running buffers are NOT averaged: they live as a [n_devices, ...]
    stacked pytree, one slice per device, mirroring torch's per-process
    buffers.  ``unstack_batch_stats(stats, 0)`` is the rank-0 analog used
    for checkpointing/eval.

``bn="sync"`` switches the model to axis_name-threaded MaskedBatchNorm
(cross-device psum of the moment sums) — the ``--sync_bn`` flag — in which
case every device's buffers stay identical anyway.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS


def stack_batch_stats(stats, n_devices):
    """Replicate BN buffers into the per-device stacked layout."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_devices,) + x.shape), stats
    )


def unstack_batch_stats(stats, device=0):
    """Take one device's BN buffers (the torch rank-0 checkpoint analog)."""
    return jax.tree_util.tree_map(lambda x: x[device], stats)


def _spec_tree(tree, spec):
    return jax.tree_util.tree_map(lambda _: spec, tree)


def make_seg_train_step(cfg, mesh, bn="per_device"):
    """Build the sharded segmentation train step.

    Returns ``step(params, opt_state, stats_stacked, batch, class_weight,
    key, freeze) -> (params, opt_state, stats_stacked, loss, (inter, union,
    target))``.  ``batch`` leaves are sharded on their leading axis;
    ``stats_stacked`` is the [n_devices, ...] pytree from
    stack_batch_stats.  ``freeze`` is a static bool.
    """
    from ..train.train_seg import FROZEN_SCOPE, build_model
    from ..train.train_seg import SegConfig  # noqa: F401  (cfg type)
    from .mesh import DATA_AXIS

    axis = mesh.axis_names[0]
    model = build_model(cfg, axis_name=axis if bn == "sync" else None)
    if cfg.optimizer == "AdamW":
        from ..train.optim import make_adamw

        tx = make_adamw(cfg.learning_rate, cfg.weight_decay)
    else:
        from ..train.optim import make_sgd

        tx = make_sgd(cfg.learning_rate, cfg.momentum, cfg.weight_decay)

    def local_step(params, opt_state, stats1, batch, class_weight, key, freeze):
        from ..nn.losses import weighted_cross_entropy
        from ..nn.metrics import intersection_and_union
        from ..train.train_seg import _mask_frozen

        stats = jax.tree_util.tree_map(lambda x: x[0], stats1)
        # per-process RNG: each device folds in its mesh position, like one
        # torch process per GPU seeding its own generator
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_inv, k_drop = jax.random.split(key)

        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": stats},
                batch["coord"],
                batch["feat"],
                batch["valid"],
                train=True,
                rngs={"random_inv": k_inv, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            loss = weighted_cross_entropy(
                logits, batch["label"], class_weight, cfg.ignore_label
            )
            return loss, (logits, mut)

        (loss, (logits, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, axis)  # DDP gradient averaging
        if freeze:
            grads = _mask_frozen(grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        if freeze:
            updates = _mask_frozen(updates)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        pred = jnp.argmax(logits, -1)
        inter, union, target = intersection_and_union(
            pred, batch["label"], cfg.num_class, cfg.ignore_label
        )
        loss = jax.lax.pmean(loss, axis)
        inter = jax.lax.psum(inter, axis)
        union = jax.lax.psum(union, axis)
        target = jax.lax.psum(target, axis)
        new_stats1 = jax.tree_util.tree_map(
            lambda x: x[None], mut["batch_stats"]
        )
        return new_params, new_opt_state, new_stats1, loss, (inter, union, target)

    def step(params, opt_state, stats_stacked, batch, class_weight, key, freeze=False):
        mapped = jax.shard_map(
            partial(local_step, freeze=freeze),
            mesh=mesh,
            in_specs=(
                _spec_tree(params, P()),
                _spec_tree(opt_state, P()),
                _spec_tree(stats_stacked, P(axis)),
                _spec_tree(batch, P(axis)),
                P(),
                P(),
            ),
            out_specs=(
                _spec_tree(params, P()),
                _spec_tree(opt_state, P()),
                _spec_tree(stats_stacked, P(axis)),
                P(),
                (P(), P(), P()),
            ),
            check_vma=False,
        )
        return mapped(params, opt_state, stats_stacked, batch, class_weight, key)

    return jax.jit(step, static_argnames=("freeze",))


def make_cls_train_step(cfg, mesh):
    """Sharded classification train step (the nn.DataParallel analog:
    per-replica BN, averaged gradients).

    Returns ``step(params, opt_state, stats_stacked, points, target, key)
    -> (params, opt_state, stats_stacked, loss, correct)``.
    """
    from ..data.transforms import fps_sample, transform_point_cloud
    from ..nn.losses import smooth_cls_loss
    from ..train.train_cls import build_model

    axis = mesh.axis_names[0]
    model = build_model(cfg)
    if cfg.optimizer == "Adam":
        from ..train.optim import make_adam

        tx = make_adam(cfg.learning_rate, cfg.decay_rate)
    else:
        from ..train.optim import make_sgd

        tx = make_sgd(cfg.learning_rate, momentum=0.9)

    def local_step(params, opt_state, stats1, points, target, key):
        stats = jax.tree_util.tree_map(lambda x: x[0], stats1)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_aug, k_inv, k_drop = jax.random.split(key, 3)
        pts = fps_sample(points, cfg.num_point)
        if cfg.aug_scale or cfg.aug_shift:
            pts = pts.at[..., :3].set(
                transform_point_cloud(
                    k_aug, pts[..., :3], cfg.aug_scale, cfg.aug_shift
                )
            )

        def loss_fn(p):
            logp, mut = model.apply(
                {"params": p, "batch_stats": stats},
                pts,
                train=True,
                rngs={"random_inv": k_inv, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            return smooth_cls_loss(logp, target), (logp, mut)

        (loss, (logp, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        grads = jax.lax.pmean(grads, axis)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        correct = jax.lax.psum(
            jnp.sum(jnp.argmax(logp, -1) == target), axis
        )
        loss = jax.lax.pmean(loss, axis)
        new_stats1 = jax.tree_util.tree_map(
            lambda x: x[None], mut["batch_stats"]
        )
        return new_params, new_opt_state, new_stats1, loss, correct

    def step(params, opt_state, stats_stacked, points, target, key):
        mapped = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(
                _spec_tree(params, P()),
                _spec_tree(opt_state, P()),
                _spec_tree(stats_stacked, P(axis)),
                P(axis),
                P(axis),
                P(),
            ),
            out_specs=(
                _spec_tree(params, P()),
                _spec_tree(opt_state, P()),
                _spec_tree(stats_stacked, P(axis)),
                P(),
                P(),
            ),
            check_vma=False,
        )
        return mapped(params, opt_state, stats_stacked, points, target, key)

    return jax.jit(step)
