"""Segmentation metrics: histogram intersection/union/target counts.

Device-friendly re-implementation of intersectionAndUnion[GPU]
(segmentation/util/utils.py:44-71): predictions at ignored targets are
remapped to the ignore label first (so they count as neither hit nor miss),
then per-class histograms are accumulated.  The three count vectors are what
the trainers all-reduce across devices (`psum` replaces dist.all_reduce,
segmentation/tool/train.py:293-303).
"""

import jax.numpy as jnp


def intersection_and_union(pred, target, num_class, ignore_index=255):
    """Args:
      pred: [...] int predictions in [0, K).
      target: [...] int labels in [0, K) or == ignore_index.

    Returns:
      (intersection [K], union [K], target_area [K]) float32 count vectors.
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    keep = target != ignore_index
    pred = jnp.where(keep, pred, ignore_index)

    def hist(x, mask):
        oh = (x[:, None] == jnp.arange(num_class)[None, :]) & mask[:, None]
        return jnp.sum(oh.astype(jnp.float32), axis=0)

    inter = hist(pred, keep & (pred == target))
    area_pred = hist(pred, keep)
    area_target = hist(target, keep)
    union = area_pred + area_target - inter
    return inter, union, area_target


def iou_from_counts(intersection, union, target):
    """(mIoU, mAcc, allAcc) from accumulated count vectors."""
    iou_class = intersection / (union + 1e-10)
    acc_class = intersection / (target + 1e-10)
    miou = jnp.mean(iou_class)
    macc = jnp.mean(acc_class)
    allacc = jnp.sum(intersection) / (jnp.sum(target) + 1e-10)
    return miou, macc, allacc
