"""Segmentation trainer: the TPU re-design of segmentation/tool/train.py.

One jitted train step over padded scene batches: weighted cross-entropy with
ignore label, AdamW, histogram IoU counters.  The reference's
``freeze_epoch`` (constructor params frozen after N epochs,
tool/train.py:272-276) becomes a static flag on the step that zeroes both the
constructor's gradients and its optimizer updates (so AdamW's decoupled decay
cannot move frozen weights either).
"""

import dataclasses
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..models import get_model
from ..nn.losses import weighted_cross_entropy
from ..nn.metrics import intersection_and_union
from .optim import make_adamw, make_sgd, multistep_lr, set_lr

FROZEN_SCOPE = "surface_constructor"


@dataclasses.dataclass(frozen=True)
class SegConfig:
    """Mirror of the reference argparse surface (tool/train.py:33-103) with
    the recipe defaults of scripts/s3dis/train_repsurf_umb.sh."""

    model: str = "repsurf.repsurf_umb_ssg"
    dataset: str = "S3DIS"
    num_class: int = 13
    ignore_label: int = 255
    # ScanNet protocol (tool/train.py:458-468): class 0 is 'unannotated' —
    # predictions argmax over classes 1.. and remap +1, never predicting 0
    pred_ignore0: bool = False
    test_area: int = 5
    batch_size: int = 8
    batch_size_val: int = 8
    epoch: int = 100
    optimizer: str = "AdamW"
    learning_rate: float = 6e-3
    weight_decay: float = 1e-2
    momentum: float = 0.9
    lr_decay: float = 0.1
    lr_decay_epochs: Sequence[int] = (60, 80)
    min_val: int = 60
    val_freq: int = 1
    freeze_epoch: int = int(1e6)
    seed: int = 2000
    voxel_size: float = 0.04
    voxel_max: int = 80000
    in_channel: int = 6
    data_norm: str = "mean"
    loop: int = 30
    # model
    group_size: int = 8
    return_polar: bool = False
    num_sector: int = 4
    head_dropout: float = 0.5
    # augmentation flags (tool/train.py:74-94)
    aug_scale: bool = False
    aug_rotate: Optional[str] = None
    aug_jitter: bool = False
    aug_flip: bool = False
    aug_shift: bool = False
    color_contrast: bool = False
    color_shift: bool = False
    color_jitter: bool = False
    hs_shift: bool = False
    color_drop: bool = False


class SegTrainState(train_state.TrainState):
    batch_stats: Any = None


def build_model(cfg, axis_name=None):
    kwargs = dict(num_class=cfg.num_class, axis_name=axis_name)
    if "repsurf" in cfg.model:
        kwargs.update(
            group_size=cfg.group_size,
            return_polar=cfg.return_polar,
            num_sector=cfg.num_sector,
            head_dropout=cfg.head_dropout,
        )
    else:
        kwargs.update(num_sector=cfg.num_sector)
    return get_model(cfg.model, **kwargs)


def create_state(cfg, n_points=None, key=None, axis_name=None):
    model = build_model(cfg, axis_name=axis_name)
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    n = n_points or cfg.voxel_max
    pos = jnp.zeros((1, n, 3), jnp.float32)
    rgb = jnp.zeros((1, n, cfg.in_channel - 3), jnp.float32)
    valid = jnp.full((1,), n, jnp.int32)
    variables = model.init({"params": key}, pos, rgb, valid, train=False)
    if cfg.optimizer == "AdamW":
        tx = make_adamw(cfg.learning_rate, cfg.weight_decay)
    else:
        tx = make_sgd(cfg.learning_rate, cfg.momentum, cfg.weight_decay)
    return SegTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables["batch_stats"],
    )


def _mask_frozen(tree, zero_like=True):
    """Zero out the surface-constructor subtree of a grad/update pytree."""
    if FROZEN_SCOPE not in tree:
        return tree
    frozen = jax.tree_util.tree_map(jnp.zeros_like, tree[FROZEN_SCOPE])
    out = dict(tree)
    out[FROZEN_SCOPE] = frozen
    return type(tree)(out) if not isinstance(tree, dict) else out


@partial(jax.jit, static_argnames=("cfg", "freeze"), donate_argnums=(0,))
def train_step(state, batch, class_weight, key, cfg, freeze=False):
    """batch: dict(coord [B,N,3], feat [B,N,C], label [B,N], valid [B])."""
    k_inv, k_drop = jax.random.split(key)

    def loss_fn(params):
        logits, mut = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
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

    (loss, (logits, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    if freeze:
        grads = _mask_frozen(grads)
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    if freeze:
        updates = _mask_frozen(updates)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p + u, state.params, updates
    )
    state = state.replace(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        batch_stats=mut["batch_stats"],
    )

    pred = _predict(logits, cfg)
    inter, union, target = intersection_and_union(
        pred, batch["label"], cfg.num_class, cfg.ignore_label
    )
    return state, loss, (inter, union, target)


def _predict(logits, cfg):
    """Argmax with the ScanNet 'never predict unannotated' remap
    (reference: output[:, 1:].max(1)[1] + 1)."""
    if cfg.pred_ignore0:
        return jnp.argmax(logits[..., 1:], -1) + 1
    return jnp.argmax(logits, -1)


@partial(jax.jit, static_argnames=("cfg",))
def eval_step(state, batch, class_weight, cfg):
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["coord"],
        batch["feat"],
        batch["valid"],
        train=False,
    )
    loss = weighted_cross_entropy(
        logits, batch["label"], class_weight, cfg.ignore_label
    )
    pred = _predict(logits, cfg)
    inter, union, target = intersection_and_union(
        pred, batch["label"], cfg.num_class, cfg.ignore_label
    )
    return loss, pred, (inter, union, target)


def epoch_lr(cfg, epoch):
    return multistep_lr(cfg.learning_rate, tuple(cfg.lr_decay_epochs), cfg.lr_decay)(
        epoch
    )


def set_epoch_lr(state, cfg, epoch):
    return state.replace(opt_state=set_lr(state.opt_state, epoch_lr(cfg, epoch)))


def is_frozen(cfg, epoch):
    """Reference condition: freeze from epoch index >= freeze_epoch
    (tool/train.py:272: `args.freeze_epoch < epoch + 1`)."""
    return cfg.freeze_epoch < epoch + 1
