"""Exact optimizer-dynamics parity against torch, isolated from the model.

The full-model trajectory tests (test_trajectory_parity.py) are bounded by
the pipeline's discrete chaos (Adam's first step is sign(g)*lr on every
element, so f32 gradient noise flips update signs and compounds).  These
tests remove the model entirely: BOTH sides consume the IDENTICAL synthetic
gradient sequence, so Adam/AdamW moment accumulation, bias correction,
coupled-vs-decoupled weight decay, SGD momentum, LR schedules (including the
cls scheduler-before-epoch quirk), and the freeze masking are compared
elementwise at float precision over 50 steps.  Reference dynamics matched:
  * torch.optim.Adam(weight_decay=) — coupled L2 (classification recipe,
    train_cls_scanobjectnn.py:179-185) + StepLR stepped BEFORE each epoch
    (train_cls_scanobjectnn.py:211);
  * torch.optim.AdamW — decoupled decay (segmentation util/utils.py:213) +
    MultiStepLR stepped after each epoch (tool/train.py:223) + the
    freeze_epoch requires_grad=False flip (tool/train.py:272-276);
  * torch.optim.SGD(momentum=0.9, weight_decay=) (pointtransformer recipe).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from repsurf_tpu.train.optim import (
    make_adam,
    make_adamw,
    make_sgd,
    multistep_lr,
    set_lr,
    step_lr,
)

STEPS = 50
SHAPES = {"w1": (7, 5), "b1": (5,), "w2": (5, 3), "scale": (3,)}


def _init_params(seed=0):
    rng = np.random.RandomState(seed)
    return {k: rng.randn(*s).astype(np.float32) for k, s in SHAPES.items()}


def _grad_seq(seed=1):
    rng = np.random.RandomState(seed)
    return [
        {k: rng.randn(*s).astype(np.float32) for k, s in SHAPES.items()}
        for _ in range(STEPS)
    ]


def _torch_params(params):
    return {
        k: torch.nn.Parameter(torch.from_numpy(v.copy())) for k, v in params.items()
    }


def _run_ours(tx, grads, params, lr_fn=None, freeze_from=None, frozen=()):
    p = {k: jnp.asarray(v) for k, v in params.items()}
    opt_state = tx.init(p)
    history = []
    for e, g in enumerate(grads):
        if lr_fn is not None:
            opt_state = set_lr(opt_state, lr_fn(e))
        g = {k: jnp.asarray(v) for k, v in g.items()}
        if freeze_from is not None and e >= freeze_from:
            g = {k: (jnp.zeros_like(v) if k in frozen else v) for k, v in g.items()}
        updates, opt_state = tx.update(g, opt_state, p)
        if freeze_from is not None and e >= freeze_from:
            updates = {
                k: (jnp.zeros_like(v) if k in frozen else v)
                for k, v in updates.items()
            }
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, updates)
        history.append({k: np.asarray(v) for k, v in p.items()})
    return history


def _run_torch(opt_cls, opt_kw, grads, params, sched_fn=None, pre_step=False,
               freeze_from=None, frozen=()):
    tp = _torch_params(params)
    opt = opt_cls(list(tp.values()), **opt_kw)
    sched = sched_fn(opt) if sched_fn else None
    names = list(tp.keys())
    history = []
    for e, g in enumerate(grads):
        if sched is not None and pre_step:
            sched.step()
        if freeze_from is not None and e == freeze_from:
            for k in frozen:
                tp[k].requires_grad = False
        opt.zero_grad()
        for k in names:
            if tp[k].requires_grad:
                tp[k].grad = torch.from_numpy(g[k].copy())
        opt.step()
        if sched is not None and not pre_step:
            sched.step()
        history.append({k: v.detach().numpy().copy() for k, v in tp.items()})
    return history


def _assert_histories(ours, theirs, atol=2e-6):
    for e, (a, b) in enumerate(zip(ours, theirs)):
        for k in a:
            np.testing.assert_allclose(
                a[k], b[k], atol=atol, rtol=0,
                err_msg=f"step {e} leaf {k}",
            )


class TestAdamCoupledL2StepLR:
    # scheduler-before-step is the reference's own quirk, reproduced on purpose
    @pytest.mark.filterwarnings("ignore:Detected call of")
    def test_50_steps(self):
        params = _init_params()
        grads = _grad_seq()
        lr_fn = step_lr(1e-3, decay_step=8, gamma=0.7, pre_step=True)
        ours = _run_ours(make_adam(1e-3, weight_decay=1e-4), grads, params, lr_fn)
        theirs = _run_torch(
            torch.optim.Adam,
            dict(lr=1e-3, weight_decay=1e-4),
            grads,
            params,
            sched_fn=lambda o: torch.optim.lr_scheduler.StepLR(
                o, step_size=8, gamma=0.7
            ),
            pre_step=True,
        )
        _assert_histories(ours, theirs)


class TestAdamWMultiStepFreeze:
    def test_50_steps_with_freeze(self):
        params = _init_params()
        grads = _grad_seq()
        lr_fn = multistep_lr(6e-3, (20, 35), 0.1)
        frozen = ("w1", "b1")
        ours = _run_ours(
            make_adamw(6e-3, weight_decay=1e-2),
            grads,
            params,
            lr_fn,
            freeze_from=25,
            frozen=frozen,
        )
        theirs = _run_torch(
            torch.optim.AdamW,
            dict(lr=6e-3, weight_decay=1e-2),
            grads,
            params,
            sched_fn=lambda o: torch.optim.lr_scheduler.MultiStepLR(
                o, milestones=[20, 35], gamma=0.1
            ),
            pre_step=False,
            freeze_from=25,
            frozen=frozen,
        )
        _assert_histories(ours, theirs, atol=1e-5)
        # the frozen leaves must be EXACTLY unmoved after the flip on both
        # sides (torch skips grad-None params entirely; our update mask must
        # also defeat AdamW's decoupled decay)
        for k in frozen:
            np.testing.assert_array_equal(ours[25][k], ours[-1][k])
            np.testing.assert_array_equal(theirs[25][k], theirs[-1][k])


class TestSGDMomentumCoupledL2:
    def test_50_steps(self):
        params = _init_params()
        grads = _grad_seq()
        ours = _run_ours(make_sgd(0.05, momentum=0.9, weight_decay=1e-4), grads, params)
        theirs = _run_torch(
            torch.optim.SGD,
            dict(lr=0.05, momentum=0.9, weight_decay=1e-4),
            grads,
            params,
        )
        _assert_histories(ours, theirs, atol=1e-5)
