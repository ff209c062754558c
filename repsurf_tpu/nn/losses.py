"""Losses matching the reference training objectives.

  * SmoothClsLoss — label smoothing (0.1) over log-probabilities
    (classification/util/utils.py:55-69; the model already applies
    log_softmax).
  * weighted_cross_entropy — torch.nn.CrossEntropyLoss(weight, ignore_index)
    semantics (segmentation/util/utils.py:227-228): per-class weights, the
    mean is normalized by the summed weights of the non-ignored targets.
"""

import jax
import jax.numpy as jnp


def smooth_cls_loss(log_probs, target, smoothing_ratio=0.1):
    """Label-smoothed NLL over log-probabilities.

    Args:
      log_probs: [B, K] log-probabilities (model output).
      target: [B] int labels.
    """
    eps = smoothing_ratio
    k = log_probs.shape[-1]
    one_hot = jax.nn.one_hot(target, k, dtype=log_probs.dtype)
    smoothed = one_hot * (1 - eps) + (1 - one_hot) * eps / (k - 1)
    return -jnp.sum(smoothed * log_probs, axis=-1).mean()


def nll_loss(log_probs, target):
    """Plain NLL (classification/util/utils.py:45-52, ClsLoss)."""
    picked = jnp.take_along_axis(log_probs, target[:, None], axis=-1)[:, 0]
    return -picked.mean()


def weighted_cross_entropy(logits, target, class_weight=None, ignore_index=255):
    """torch CrossEntropyLoss(weight=w, ignore_index=i) over flattened logits.

    Args:
      logits: [..., K] unnormalized scores.
      target: [...] int labels; entries == ignore_index contribute nothing.
      class_weight: optional [K] per-class weights.

    Returns:
      scalar: sum(w[t] * nll) / sum(w[t]) over non-ignored positions.
    """
    k = logits.shape[-1]
    logits = logits.reshape(-1, k)
    target = target.reshape(-1)
    keep = target != ignore_index
    safe_t = jnp.where(keep, target, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_t[:, None], axis=-1)[:, 0]
    if class_weight is None:
        w = keep.astype(logits.dtype)
    else:
        w = jnp.where(keep, class_weight[safe_t], 0.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-10)
