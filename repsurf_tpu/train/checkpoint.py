"""Checkpointing: Orbax save/restore with the reference's save-on-best policy.

The reference saves a dict {epoch, metric, model_state, optimizer_state} only
when the validation metric improves (classification
train_cls_scanobjectnn.py:261-271, segmentation tool/train.py:246-253).
"""

import os

import jax
import orbax.checkpoint as ocp


class BestCheckpointer:
    """Keeps exactly one checkpoint: the best-metric state so far."""

    def __init__(self, ckpt_dir):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.best_metric = float("-inf")
        self.best_epoch = -1

    @property
    def path(self):
        return os.path.join(self.ckpt_dir, "best")

    def maybe_save(self, metric, epoch, state):
        """Save iff metric >= best so far (reference uses >=). Returns bool."""
        if metric < self.best_metric:
            return False
        self.best_metric = metric
        self.best_epoch = epoch
        path = self.path
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckpt.save(path, jax.device_get(state))
        self._ckpt.wait_until_finished()
        return True

    def restore(self, template):
        """Restore into the structure of `template` (a matching pytree)."""
        return self._ckpt.restore(self.path, target=template)

    def exists(self):
        return os.path.exists(self.path)
