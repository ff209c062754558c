"""Classification trainer: the TPU re-design of
classification/tool/train_cls_scanobjectnn.py.

The per-batch pipeline (FPS 2048 -> num_point, optional augmentation, model
forward, smoothed loss, Adam step) is one jitted function; vote evaluation
(10 stochastic forward passes with per-vote rescale,
train_cls_scanobjectnn.py:70-108) is a jitted ``lax.scan`` over votes.
"""

import dataclasses
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..data.scanobjectnn import iterate_batches
from ..data.transforms import fps_sample, scale_point_cloud, transform_point_cloud
from ..models import get_model
from ..nn.losses import smooth_cls_loss
from .optim import make_adam, make_sgd, set_lr, step_lr


@dataclasses.dataclass(frozen=True)
class ClsConfig:
    """Mirror of the reference argparse surface
    (train_cls_scanobjectnn.py:22-67) with the recipe defaults of
    scripts/scanobjectnn/repsurf_ssg_umb.sh."""

    model: str = "repsurf.repsurf_ssg_umb"
    num_class: int = 15
    num_point: int = 1024
    batch_size: int = 64
    epoch: int = 250
    optimizer: str = "Adam"
    learning_rate: float = 1e-3
    decay_rate: float = 1e-4
    momentum: float = 0.9  # SGD only
    decay_step: int = 20
    min_val: int = 100
    seed: int = 2800
    aug_scale: bool = False
    aug_shift: bool = False
    group_size: int = 8
    umb_pool: str = "sum"
    return_dist: bool = True
    return_center: bool = True
    return_polar: bool = True
    num_votes: int = 10
    init_type: Optional[str] = None  # kaiming | xavier | None (torch default)
    head_dropout: float = 0.4


class ClsTrainState(train_state.TrainState):
    batch_stats: Any = None


def build_model(cfg):
    return get_model(
        cfg.model,
        num_class=cfg.num_class,
        group_size=cfg.group_size,
        umb_pool=cfg.umb_pool,
        return_dist=cfg.return_dist,
        return_center=cfg.return_center,
        return_polar=cfg.return_polar,
        head_dropout=cfg.head_dropout,
    )


def create_state(cfg, key=None):
    model = build_model(cfg)
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    example = jnp.zeros((2, cfg.num_point, 3), jnp.float32)
    variables = model.init({"params": key}, example, train=False)
    if cfg.optimizer == "Adam":
        tx = make_adam(cfg.learning_rate, cfg.decay_rate)
    else:
        tx = make_sgd(cfg.learning_rate, momentum=cfg.momentum)
    return ClsTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables["batch_stats"],
    )


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_step(state, points, target, key, cfg):
    """One optimizer step.  points: [B, N_raw, >=3] raw clouds."""
    k_aug, k_inv, k_drop = jax.random.split(key, 3)
    pts = fps_sample(points, cfg.num_point)
    if cfg.aug_scale or cfg.aug_shift:
        pts = pts.at[..., :3].set(
            transform_point_cloud(
                k_aug, pts[..., :3], cfg.aug_scale, cfg.aug_shift
            )
        )

    def loss_fn(params):
        logp, mut = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            pts,
            train=True,
            rngs={"random_inv": k_inv, "dropout": k_drop},
            mutable=["batch_stats"],
        )
        return smooth_cls_loss(logp, target), (logp, mut)

    (loss, (logp, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    state = state.apply_gradients(grads=grads, batch_stats=mut["batch_stats"])
    correct = jnp.sum(jnp.argmax(logp, -1) == target)
    return state, loss, correct


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(state, points, target, key, cfg):
    """Vote evaluation: vote 0 unscaled, votes 1..V-1 randomly rescaled
    (+-0.2), log-prob sums averaged (train_cls_scanobjectnn.py:82-103).
    Returns (single_correct, vote_correct)."""
    pts = fps_sample(points, cfg.num_point)
    keys = jax.random.split(key, cfg.num_votes * 2).reshape(cfg.num_votes, 2, -1)

    def one_vote(carry, xs):
        i, (k_scale, k_inv) = xs
        p = jnp.where(
            i > 0,
            pts.at[..., :3].set(scale_point_cloud(k_scale, pts[..., :3])),
            pts,
        )
        logp = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            p,
            train=False,
            rngs={"random_inv": k_inv},
        )
        return carry + logp, logp

    vote_sum, all_logp = jax.lax.scan(
        one_vote,
        jnp.zeros((points.shape[0], cfg.num_class)),
        (jnp.arange(cfg.num_votes), keys),
    )
    sing_pred = jnp.argmax(all_logp[0], -1)
    vote_pred = jnp.argmax(vote_sum, -1)
    return jnp.sum(sing_pred == target), jnp.sum(vote_pred == target)


def train_epoch(state, dataset, cfg, epoch, key, rng=None):
    """One epoch over the dataset; returns (state, mean_loss, accuracy)."""
    lr = step_lr(cfg.learning_rate, cfg.decay_step)(epoch)
    state = state.replace(opt_state=set_lr(state.opt_state, lr))
    losses, correct, total = [], 0, 0
    for i, (pts, lbl) in enumerate(
        iterate_batches(dataset, cfg.batch_size, shuffle=True, drop_last=True, rng=rng)
    ):
        sub = jax.random.fold_in(key, i)
        state, loss, corr = train_step(
            state, jnp.asarray(pts), jnp.asarray(lbl), sub, cfg
        )
        losses.append(float(loss))
        correct += int(corr)
        total += len(lbl)
    acc = correct / max(total, 1)
    return state, float(np.mean(losses)) if losses else 0.0, acc


def train_epoch_sharded(
    step, params, opt_state, stats_stacked, dataset, cfg, epoch, key, rng=None
):
    """One epoch with the shard_map (DataParallel-parity) step from
    parallel.shard_step.make_cls_train_step: per-device BN, averaged
    gradients.  Returns (params, opt_state, stats_stacked, loss, acc)."""
    lr = step_lr(cfg.learning_rate, cfg.decay_step)(epoch)
    opt_state = set_lr(opt_state, lr)
    losses, correct, total = [], 0, 0
    for i, (pts, lbl) in enumerate(
        iterate_batches(dataset, cfg.batch_size, shuffle=True, drop_last=True, rng=rng)
    ):
        sub = jax.random.fold_in(key, i)
        params, opt_state, stats_stacked, loss, corr = step(
            params, opt_state, stats_stacked, jnp.asarray(pts),
            jnp.asarray(lbl), sub,
        )
        losses.append(float(loss))
        correct += int(corr)
        total += len(lbl)
    acc = correct / max(total, 1)
    return (
        params, opt_state, stats_stacked,
        float(np.mean(losses)) if losses else 0.0, acc,
    )


def evaluate(state, dataset, cfg, key):
    """Full vote evaluation; returns (single_acc, vote_acc)."""
    sing, vote, total = 0, 0, 0
    for i, (pts, lbl) in enumerate(iterate_batches(dataset, cfg.batch_size)):
        sub = jax.random.fold_in(key, i)
        s, v = eval_step(state, jnp.asarray(pts), jnp.asarray(lbl), sub, cfg)
        sing += int(s)
        vote += int(v)
        total += len(lbl)
    return sing / max(total, 1), vote / max(total, 1)
