"""Multi-step training-trajectory parity against the PyTorch reference.

test_train_parity.py pins ONE SGD step; reaching the published accuracies
additionally depends on Adam/AdamW moment dynamics, weight-decay coupling,
LR-schedule application (including the cls scheduler-before-epoch quirk),
BatchNorm-momentum compounding, and the seg freeze_epoch flip.  These tests
run 20 identical-batch steps with the PRODUCTION optimizers and schedules on
both sides and assert bounded drift:
  * classification: Adam(lr 1e-3, coupled wd 1e-4) + StepLR(8, 0.7) with the
    pre-step quirk (train_cls_scanobjectnn.py:206-259, scheduler.step() at
    the top of every epoch);
  * segmentation: AdamW(lr 6e-3, wd 1e-2) + MultiStepLR((8, 14), 0.1) stepped
    after each epoch + the freeze_epoch flip at step 10
    (tool/train.py:223,261-318 — requires_grad=False on surface_constructor).

Each step is treated as one "epoch" for schedule purposes so 20 steps cross
two LR decays and the freeze boundary.

Drift contract — measured THIS round with correct optimizers on both sides
(numbers in _assert_trajectory): Adam's first step is sign(g)*lr on every
element, so f32 gradient noise flips update signs wherever |g| is at noise
level, and the pipeline's discrete chaos (test_train_parity.py docstring)
compounds it — after 20 steps the cumulative-update Frobenius drift between
two CORRECT f32 implementations measures 0.97 (cls), i.e. elementwise
comparison is uninformative at this horizon.  The division of labor is
therefore: test_optim_parity.py pins the moment/decay/schedule/freeze
DYNAMICS exactly (identical synthetic gradients, no model, 1e-5 over 50
steps), while these tests pin what chaos cannot fake — step-0 loss
agreement, the LR schedule value at every step, comparable total descent,
a gross-divergence ceiling, and (seg) the frozen subtree bit-frozen.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from repsurf_tpu.train import torch_import as ti

from . import torch_ref
from .test_train_parity import _Args, _leaves_with_paths, _zero_dropout

pytestmark = pytest.mark.skipif(
    not torch_ref.reference_available(), reason="/root/reference not present"
)

STEPS = 20


def _global_drift(pre, ours_post, torch_post):
    """Relative Frobenius distance between the two cumulative updates,
    computed globally over all leaves: ||u_ours - u_ref|| / ||u_ref||."""
    pre_l = _leaves_with_paths(pre)
    ours_l = _leaves_with_paths(ours_post)
    ref_l = _leaves_with_paths(torch_post)
    num = 0.0
    den = 0.0
    for k in pre_l:
        u_ours = ours_l[k].astype(np.float64) - pre_l[k].astype(np.float64)
        u_ref = ref_l[k].astype(np.float64) - pre_l[k].astype(np.float64)
        num += float(np.sum((u_ours - u_ref) ** 2))
        den += float(np.sum(u_ref**2))
    return float(np.sqrt(num / max(den, 1e-30)))


def _assert_trajectory(ours, theirs, drift, label=""):
    """The chaos-aware trajectory contract (see module docstring).

    Measured with correct optimizers (this round): cls — step-0 diff
    2.5e-4, per-step diffs grow chaotically to 0.47 max at unchanged trend,
    total descent 2.08 vs 2.09, cumulative Frobenius drift 0.97
    (uncorrelated updates of equal norm would measure sqrt(2) ~ 1.41);
    seg — per-step diffs <= 0.042, descent 0.603 vs 0.593, drift 0.72."""
    # step 0 is pre-divergence: identical weights, one forward/backward —
    # a loss-definition or gradient-scale bug shows here at f32 precision
    assert abs(ours[0] - theirs[0]) < 1e-3, (
        f"{label} step-0 loss {ours[0]:.6f} vs {theirs[0]:.6f}"
    )
    # both sides must LEARN comparably: a dead optimizer, 10x LR, or wrong
    # decay mode changes total descent far beyond the chaos band
    d_ours = ours[0] - min(ours)
    d_theirs = theirs[0] - min(theirs)
    assert d_theirs > 0.05, f"{label} torch did not learn — vacuous test"
    assert abs(d_ours - d_theirs) < 0.35 * max(d_ours, d_theirs) + 0.05, (
        f"{label} descent {d_ours:.3f} vs {d_theirs:.3f}"
    )
    diffs = [abs(a - b) for a, b in zip(ours, theirs)]
    assert max(diffs) < 1.0, f"{label} per-step loss diffs {diffs}"
    assert drift < 1.25, (
        f"{label} cumulative update drift {drift:.3f} at the "
        "uncorrelated-updates level — systematic divergence, not chaos"
    )


def _stats_drift(ours_post, torch_post):
    """Worst relative error over BN running-stat leaves."""
    ours_l = _leaves_with_paths(ours_post["batch_stats"])
    ref_l = _leaves_with_paths(torch_post["batch_stats"])
    worst = 0.0
    for k in ours_l:
        scale = max(np.abs(ref_l[k]).max(), 1e-6)
        worst = max(worst, float(np.abs(ours_l[k] - ref_l[k]).max() / scale))
    return worst


class TestClsTrajectoryParity:
    # scheduler-before-step is the reference's own quirk, reproduced on purpose
    @pytest.mark.filterwarnings("ignore:Detected call of")
    def test_adam_steplr_20_steps(self):
        from repsurf_tpu.models import get_model
        from repsurf_tpu.train.optim import set_lr, step_lr
        from repsurf_tpu.train.train_cls import (
            ClsConfig,
            create_state,
            train_step,
        )

        ref = torch_ref.load_tree("classification")
        n_raw, num_point, b = 1024, 512, 2

        args = _Args()
        args.num_point = num_point
        args.num_class = 15
        args.return_dist = True
        args.return_center = True
        args.return_polar = True
        args.group_size = 8
        args.umb_pool = "sum"
        args.cuda_ops = False

        torch.manual_seed(0)
        tmodel = ref["model_umb"].Model(args)
        tmodel.train()
        tmodel.surface_constructor.random_inv = False
        _zero_dropout(tmodel)

        # two fixed batches, cycled — BN momentum compounds across repeats
        batches = []
        for seed in (11, 12):
            rng = np.random.RandomState(seed)
            cloud = rng.randn(b, n_raw, 3).astype(np.float32)
            cloud /= np.abs(cloud).max()
            target = rng.randint(0, 15, b).astype(np.int64)
            batches.append((cloud, target))

        cfg = ClsConfig(
            num_point=num_point,
            batch_size=b,
            optimizer="Adam",
            learning_rate=1e-3,
            decay_rate=1e-4,
            decay_step=8,
            head_dropout=0.0,
        )
        state = create_state(cfg, key=jax.random.PRNGKey(0))
        sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
        variables = ti.import_torch_checkpoint(
            sd,
            {"params": state.params, "batch_stats": state.batch_stats},
            ti.cls_umbrella_mapping(),
        )
        pre = jax.tree_util.tree_map(np.copy, variables)
        model = get_model(
            cfg.model,
            num_class=cfg.num_class,
            group_size=cfg.group_size,
            umb_pool=cfg.umb_pool,
            return_dist=True,
            return_center=True,
            return_polar=True,
            head_dropout=0.0,
            random_inv=False,
        )
        state = state.replace(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
        )

        opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3, weight_decay=1e-4)
        sched = torch.optim.lr_scheduler.StepLR(opt, step_size=8, gamma=0.7)
        lr_fn = step_lr(1e-3, decay_step=8, gamma=0.7, pre_step=True)

        eps = 0.1
        ours_losses, torch_losses = [], []
        for e in range(STEPS):
            cloud, target = batches[e % len(batches)]
            # ---- ours: schedule then production jitted step ----
            state = state.replace(
                opt_state=set_lr(state.opt_state, lr_fn(e))
            )
            state, loss, _ = train_step(
                state,
                jnp.asarray(cloud),
                jnp.asarray(target),
                jax.random.PRNGKey(e),
                cfg,
            )
            # ---- torch: scheduler-before-epoch quirk, then one step ----
            sched.step()
            pts = torch.from_numpy(cloud.transpose(0, 2, 1))
            with torch_ref.deterministic_fps_start():
                pts = ref["pointnet2_utils"].sample(num_point, pts)
                pred = tmodel(pts)
            one_hot = torch.zeros_like(pred).scatter(
                1, torch.from_numpy(target).view(-1, 1), 1
            )
            one_hot = one_hot * (1 - eps) + (1 - one_hot) * eps / (15 - 1)
            tloss = -(one_hot * pred).sum(dim=1).mean()
            opt.zero_grad()
            tloss.backward()
            opt.step()
            # cross-check the schedule itself, exactly
            np.testing.assert_allclose(
                opt.param_groups[0]["lr"], lr_fn(e), rtol=1e-12, atol=0
            )
            ours_losses.append(float(loss))
            torch_losses.append(float(tloss))

        sd2 = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
        fresh = jax.tree_util.tree_map(np.copy, pre)
        torch_post = ti.import_torch_checkpoint(sd2, fresh, ti.cls_umbrella_mapping())
        ours_post = {"params": state.params, "batch_stats": state.batch_stats}

        drift = _global_drift(pre, ours_post, torch_post)
        sdrift = _stats_drift(ours_post, torch_post)
        print(f"cls ours_losses={['%.4f' % d for d in ours_losses]}")
        print(f"cls torch_losses={['%.4f' % d for d in torch_losses]}")
        print(f"cls drift={drift:.4f} sdrift={sdrift:.4f}")
        _assert_trajectory(ours_losses, torch_losses, drift, label="cls")


class TestSegTrajectoryParity:
    def test_adamw_multistep_freeze_20_steps(self):
        from repsurf_tpu.data.s3dis import CLASS_WEIGHTS
        from repsurf_tpu.models import get_model
        from repsurf_tpu.train.optim import multistep_lr, set_lr
        from repsurf_tpu.train.train_seg import (
            FROZEN_SCOPE,
            SegConfig,
            create_state,
            is_frozen,
            train_step,
        )

        ref = torch_ref.load_tree("segmentation")

        args = _Args()
        args.num_class = 13
        args.in_channel = 6
        args.return_polar = True
        args.group_size = 8

        torch.manual_seed(0)
        tmodel = ref["model_seg"].Model(args)
        tmodel.train()
        tmodel.surface_constructor.random_inv = False
        tmodel.sa1.num_sector = 1
        _zero_dropout(tmodel)

        weights = np.asarray(CLASS_WEIGHTS[5], np.float32)
        sizes = [512, 256]
        n_max, b = max(sizes), len(sizes)

        def make_batch(seed):
            rng = np.random.RandomState(seed)
            pos_list = [
                (rng.rand(s, 3) * np.array([4.0, 4.0, 3.0])).astype(np.float32)
                for s in sizes
            ]
            rgb_list = [rng.rand(s, 3).astype(np.float32) for s in sizes]
            lbl_list = [rng.randint(0, 13, s).astype(np.int64) for s in sizes]
            for lbl in lbl_list:
                lbl[::17] = 255
            pos = np.zeros((b, n_max, 3), np.float32)
            rgb = np.zeros((b, n_max, 3), np.float32)
            lbl = np.full((b, n_max), 255, np.int64)
            for i, s in enumerate(sizes):
                pos[i, :s] = pos_list[i]
                rgb[i, :s] = rgb_list[i]
                lbl[i, :s] = lbl_list[i]
                pos[i, s:] = 37.0
            return (pos, rgb, lbl, np.asarray(sizes, np.int32)), (
                pos_list,
                rgb_list,
                lbl_list,
            )

        batches = [make_batch(seed) for seed in (7, 8)]

        freeze_epoch = 9  # frozen from step index 9 on (ref: fe < e+1)
        cfg = SegConfig(
            batch_size=b,
            voxel_max=n_max,
            optimizer="AdamW",
            learning_rate=6e-3,
            weight_decay=1e-2,
            lr_decay_epochs=(8, 14),
            lr_decay=0.1,
            freeze_epoch=freeze_epoch,
            num_sector=1,
            return_polar=True,
            head_dropout=0.0,
        )
        state = create_state(cfg, n_points=n_max, key=jax.random.PRNGKey(0))
        sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
        variables = ti.import_torch_checkpoint(
            sd,
            {"params": state.params, "batch_stats": state.batch_stats},
            ti.seg_umbrella_mapping(),
        )
        pre = jax.tree_util.tree_map(np.copy, variables)
        model = get_model(
            cfg.model,
            num_class=cfg.num_class,
            group_size=cfg.group_size,
            return_polar=True,
            num_sector=1,
            head_dropout=0.0,
            random_inv=False,
        )
        state = state.replace(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables["batch_stats"],
        )

        opt = torch.optim.AdamW(tmodel.parameters(), lr=6e-3, weight_decay=1e-2)
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=[8, 14], gamma=0.1
        )
        lr_fn = multistep_lr(6e-3, (8, 14), 0.1)
        criterion = torch.nn.CrossEntropyLoss(
            weight=torch.from_numpy(weights), ignore_index=255
        )

        ours_losses, torch_losses = [], []
        froze_at = None
        for e in range(STEPS):
            (pos, rgb, lbl, valid), (pos_list, rgb_list, lbl_list) = batches[
                e % len(batches)
            ]
            freeze = is_frozen(cfg, e)
            if freeze and froze_at is None:
                froze_at = e
                frozen_snapshot = jax.tree_util.tree_map(
                    np.asarray, state.params[FROZEN_SCOPE]
                )
                # reference freeze: requires_grad=False from this epoch on
                for n, p in tmodel.named_parameters():
                    if FROZEN_SCOPE in n and p.requires_grad:
                        p.requires_grad = False

            # ---- ours ----
            state = state.replace(opt_state=set_lr(state.opt_state, lr_fn(e)))
            batch = {
                "coord": jnp.asarray(pos),
                "feat": jnp.asarray(rgb),
                "label": jnp.asarray(lbl),
                "valid": jnp.asarray(valid),
            }
            state, loss, _ = train_step(
                state,
                batch,
                jnp.asarray(weights),
                jax.random.PRNGKey(e),
                cfg,
                freeze=freeze,
            )

            # ---- torch ----
            pos_flat = torch.from_numpy(np.concatenate(pos_list))
            rgb_flat = torch.from_numpy(np.concatenate(rgb_list))
            lbl_flat = torch.from_numpy(np.concatenate(lbl_list))
            offset = torch.tensor(np.cumsum(sizes), dtype=torch.int32)
            with torch_ref.patch_seg_cpu(ref["pointops"]):
                tout = tmodel([pos_flat, rgb_flat, offset])
                tloss = criterion(tout, lbl_flat)
                opt.zero_grad()
                tloss.backward()
                opt.step()
            np.testing.assert_allclose(
                opt.param_groups[0]["lr"], lr_fn(e), rtol=1e-12, atol=0
            )
            sched.step()  # seg schedule steps AFTER the epoch
            ours_losses.append(float(loss))
            torch_losses.append(float(tloss))

        assert froze_at == freeze_epoch, froze_at

        sd2 = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
        fresh = jax.tree_util.tree_map(np.copy, pre)
        torch_post = ti.import_torch_checkpoint(sd2, fresh, ti.seg_umbrella_mapping())
        ours_post = {"params": state.params, "batch_stats": state.batch_stats}

        drift = _global_drift(pre, ours_post, torch_post)
        sdrift = _stats_drift(ours_post, torch_post)
        print(f"seg ours_losses={['%.4f' % d for d in ours_losses]}")
        print(f"seg torch_losses={['%.4f' % d for d in torch_losses]}")
        print(f"seg drift={drift:.4f} sdrift={sdrift:.4f}")
        _assert_trajectory(ours_losses, torch_losses, drift, label="seg")

        # the frozen subtree must be EXACTLY unmoved after the flip on our
        # side (the grad AND update masks must defeat AdamW's decoupled
        # decay; torch's requires_grad=False analog is pinned exactly in
        # test_optim_parity.py — comparing the two subtrees to each other
        # is bounded by pre-freeze chaos, not by the freeze logic)
        ours_frozen = _leaves_with_paths(ours_post["params"][FROZEN_SCOPE])
        snap_frozen = _leaves_with_paths(frozen_snapshot)
        for k in ours_frozen:
            np.testing.assert_array_equal(
                ours_frozen[k], snap_frozen[k], err_msg=f"frozen moved: {k}"
            )
