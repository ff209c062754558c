"""Optimizers and LR schedules matching the reference recipes (optax).

  * classification: Adam(lr 1e-3, wd 1e-4 as torch's Adam weight_decay — a
    coupled L2 term added to the gradient, NOT decoupled AdamW) + StepLR(step
    20, gamma 0.7) with the reference's scheduler-before-epoch quirk: epoch e
    trains at lr0 * gamma^((e+1) // step) (train_cls_scanobjectnn.py:211
    calls scheduler.step() before the batch loop).
  * segmentation: AdamW(lr 6e-3, wd 1e-2) + MultiStepLR([60, 80], 0.1)
    stepped after each epoch (tool/train.py:223).

The per-epoch LR is injected via optax.inject_hyperparams so the jitted step
never recompiles on LR changes.  Freezing (seg freeze_epoch) is a gradient
mask applied outside the optimizer.
"""

import jax.numpy as jnp
import optax


def step_lr(base_lr, decay_step=20, gamma=0.7, pre_step=True):
    """torch StepLR as a function of epoch index (0-based)."""

    def lr(epoch):
        k = epoch + 1 if pre_step else epoch
        return base_lr * gamma ** (k // decay_step)

    return lr


def multistep_lr(base_lr, milestones=(60, 80), gamma=0.1):
    """torch MultiStepLR stepped after each epoch."""

    def lr(epoch):
        n = sum(1 for m in milestones if epoch >= m)
        return base_lr * gamma**n

    return lr


def make_adam(base_lr=1e-3, weight_decay=1e-4):
    """torch.optim.Adam with coupled L2 weight_decay (classification
    recipe, train_cls_scanobjectnn.py:179-185)."""

    def tx(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        steps.append(optax.scale(-learning_rate))
        return optax.chain(*steps)

    return optax.inject_hyperparams(tx)(learning_rate=base_lr)


def make_sgd(base_lr, momentum=0.9, weight_decay=0.0):
    """torch.optim.SGD(momentum) with coupled L2."""

    def tx(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.trace(decay=momentum))
        steps.append(optax.scale(-learning_rate))
        return optax.chain(*steps)

    return optax.inject_hyperparams(tx)(learning_rate=base_lr)


def make_adamw(base_lr=6e-3, weight_decay=1e-2):
    """torch.optim.AdamW (segmentation recipe, util/utils.py:213)."""

    def tx(learning_rate):
        return optax.adamw(
            learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
        )

    return optax.inject_hyperparams(tx)(learning_rate=base_lr)


def set_lr(opt_state, lr):
    """Update the injected learning_rate hyperparameter."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
