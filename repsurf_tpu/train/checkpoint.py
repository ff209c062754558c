"""Checkpointing: Orbax save/restore with the reference's save-on-best policy
and full-state resume.

The reference saves a dict {epoch, metric, model_state, optimizer_state} only
when the validation metric improves (classification
train_cls_scanobjectnn.py:261-271, segmentation tool/train.py:246-253) and
resumes model+optimizer+scheduler+best-metric from it
(tool/train.py:194-209); ``--pretrain`` restores weights only
(tool/train.py:210-215).  ``train_state_dict`` / ``apply_train_state``
package a TrainState the same way.
"""

import os

import jax
import orbax.checkpoint as ocp


def train_state_dict(state, epoch=0, best_metric=0.0):
    """Full-resume payload: params, batch stats, optimizer state, progress."""
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": epoch,
        "best_metric": best_metric,
    }


def apply_train_state(state, restored, weights_only=False):
    """Rebuild a TrainState from a restored payload.

    weights_only mirrors the reference's --pretrain (weights, fresh
    optimizer); otherwise optimizer state and step resume too.

    Returns:
      (state, start_epoch, best_metric)
    """
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )
    if weights_only:
        return state, 0, 0.0
    state = state.replace(
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(restored["opt_state"]),
        ),
        step=restored["step"],
    )
    return state, int(restored["epoch"]), float(restored["best_metric"])


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

    def restore(self, template, partial=False):
        """Restore into the structure of `template` (a matching pytree).

        partial=True restores only the subtree present in `template` — the
        eval CLIs need just {params, batch_stats} out of a full-resume
        payload (reference test_s3dis.py loads model weights alone from the
        training checkpoint the same way, tool/test_s3dis.py:74-82)."""
        if partial:
            ckptr = ocp.PyTreeCheckpointer()
            try:
                return ckptr.restore(
                    self.path,
                    args=ocp.args.PyTreeRestore(
                        item=template,
                        restore_args=ocp.checkpoint_utils.construct_restore_args(
                            template
                        ),
                        partial_restore=True,
                    ),
                )
            finally:
                ckptr.close()
        return self._ckpt.restore(self.path, target=template)

    def exists(self):
        return os.path.exists(self.path)
