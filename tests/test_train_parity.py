"""Training-step differential parity against the PyTorch reference.

The forward-parity tests (test_reference_parity.py) prove eval-mode logits
agree; these prove that ONE OPTIMIZER STEP from identical weights on an
identical batch produces the same parameter update and the same BatchNorm
running-statistic update — the dynamics that determine whether the published
accuracies (classification/README.md:73-89, segmentation/README.md:75-85)
are reachable.  Reference training steps matched:
  * classification/tool/train_cls_scanobjectnn.py:206-259 (sample -> model
    train-mode forward -> SmoothClsLoss -> backward -> optimizer.step())
  * segmentation/tool/train.py:261-318 (model -> weighted CE(ignore) ->
    backward -> optimizer.step())

Determinism knobs: SGD momentum 0 / lr 0.01 / no weight decay on both sides
(one step from a fresh optimizer also equals the momentum path's first step;
this isolates gradient parity from Adam epsilon-order noise), dropout
disabled on both sides (torch p=0, ours head_dropout=0), random_inv off,
FPS start pinned to index 0, sectorized FPS off (num_sector=1 on both —
our sectorizer is the documented static-shape deviation, PARITY.md).

Comparison: both post-step torch state dicts are re-imported through
train/torch_import.py, so the assertion runs leaf-by-leaf in our parameter
space on the UPDATE (post - pre): relative error per leaf against the
reference's own update magnitude.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from repsurf_tpu.train import torch_import as ti

from . import torch_ref

pytestmark = pytest.mark.skipif(
    not torch_ref.reference_available(), reason="/root/reference not present"
)

LR = 0.01


class _Args:
    pass


def _zero_dropout(tmodel):
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def _leaves_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}


def _assert_update_parity(
    pre, ours_post, torch_post, rtol=1e-2, label="", median_rtol=None
):
    """Leaf-wise relative agreement of (post - pre) updates.

    pre / ours_post / torch_post: {params, batch_stats} variable dicts.

    Tolerance: per-leaf relative ``rtol``, floored at 1e-3 of the GLOBAL
    max update magnitude.  The floor matters for two classes of leaf whose
    true gradient is (near-)zero by construction: conv biases feeding
    straight into train-mode BatchNorm (the mean subtraction exactly cancels
    any constant shift — both sides' updates there are pure float noise,
    ~2e-6 measured) and deep-decoder leaves whose gradient terms nearly
    cancel.  A semantic bug (wrong BN axes, wrong feature order, missed
    freeze) shows up as err ~ scale on MEANINGFUL leaves — e.g. the aliasing
    bug this test caught in train/torch_import.py produced err == scale on
    every BatchNorm leaf — which the global floor never masks.

    Measured noise band (round 5, documented so the tolerance is evidence,
    not hope).  A float64 torch oracle is unobtainable: the reference
    forward is discretely chaotic — running it in f64 flips phi-argsort
    ties / normal-sign boundaries in the umbrella geometry and diverges
    from the f32 run at the FIRST umbrella linear layer (rel ~1.7 measured),
    so the only available comparison is our-f32 vs torch-f32.  Sweeping 7
    data seeds on the cls step: losses agree to <=3e-4 on every seed, but
    the worst per-leaf update error spans 1.5%-4.6%, with (a) the worst
    BN-scale channel MOVING between seeds (45/28/61/52/22 on seeds 11-15)
    and tracking err ~= (1-2.5e-5) * sum|x_hat*dy| — an accumulation-noise
    signature amplified by the BN-scale reduction's condition number
    kappa = sum|terms|/|sum terms| = 20-450 — and (b) occasional seeds
    (16, 17) where percent-level error appears across ALL leaf families at
    unchanged loss agreement, i.e. a near-tie in the sorted geometry crossed
    differently by the two implementations' ~1e-7 rounding.  Both are
    properties of comparing two correct f32 implementations of a chaotic
    pipeline, not of either implementation.  On the test's own seed (11)
    the above-floor per-leaf distribution is 17 leaves, median 0.92%,
    max 2.89%.  The two real bugs this test caught produced rel == 1.0 on
    whole leaf families; ``rtol=5e-2`` keeps a 17x separation on the worst
    leaf, and ``median_rtol`` pins the AGGREGATE behaviour (noise leaves
    the median under ~1%, a semantic bug drags most leaves toward 1.0).
    """
    pre_l = _leaves_with_paths(pre)
    ours_l = _leaves_with_paths(ours_post)
    ref_l = _leaves_with_paths(torch_post)
    assert set(pre_l) == set(ours_l) == set(ref_l)
    updates = {}
    for k in sorted(pre_l):
        updates[k] = (ours_l[k] - pre_l[k], ref_l[k] - pre_l[k])
    global_scale = max(
        max(np.abs(u_ref).max(), np.abs(u_ours).max())
        for u_ours, u_ref in updates.values()
    )
    # the step must actually have moved the parameters
    assert global_scale > 1e-5, f"{label}: no parameter moved (degenerate test)"
    floor = 1e-3 * global_scale
    rels = []
    for k, (u_ours, u_ref) in updates.items():
        scale = max(np.abs(u_ref).max(), np.abs(u_ours).max())
        err = np.abs(u_ours - u_ref).max()
        if err > floor:
            rels.append(err / scale)
        assert err <= max(rtol * scale, floor), (
            f"{label}{k}: update err {err:.3e} vs scale {scale:.3e} "
            f"(global {global_scale:.3e})"
        )
    if median_rtol is not None and rels:
        med = float(np.median(rels))
        assert med <= median_rtol, (
            f"{label}median of per-leaf rel update errors {med:.3e} > "
            f"{median_rtol:.1e} over {len(rels)} above-floor leaves — "
            "broad drift, not isolated cancellation noise"
        )


def _split_variables(variables):
    return {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }


class TestClsTrainStepParity:
    def test_repsurf_ssg_umb_sgd_step(self):
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

        rng = np.random.RandomState(11)
        cloud = rng.randn(b, n_raw, 3).astype(np.float32)
        cloud /= np.abs(cloud).max()
        target = rng.randint(0, 15, b).astype(np.int64)

        # ---- our side: the production train_step (incl. fps_sample) ----
        cfg = ClsConfig(
            num_point=num_point,
            batch_size=b,
            optimizer="SGD",
            learning_rate=LR,
            momentum=0.0,
            head_dropout=0.0,
        )
        state = create_state(cfg, key=jax.random.PRNGKey(0))
        sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
        variables = ti.import_torch_checkpoint(
            sd,
            {"params": state.params, "batch_stats": state.batch_stats},
            ti.cls_umbrella_mapping(),
        )
        pre = _split_variables(variables)
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        # random_inv off on our side too: the model flag lives in the module;
        # rebuild the state's apply_fn around a no-inv model
        from repsurf_tpu.models import get_model

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
        state = state.replace(apply_fn=model.apply)
        new_state, loss, _ = train_step(
            state, jnp.asarray(cloud), jnp.asarray(target), jax.random.PRNGKey(1), cfg
        )
        ours_post = {
            "params": new_state.params,
            "batch_stats": new_state.batch_stats,
        }

        # ---- torch side: sample -> train forward -> smooth loss -> SGD ----
        opt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=0.0)
        pts = torch.from_numpy(cloud.transpose(0, 2, 1))
        with torch_ref.deterministic_fps_start():
            pts = ref["pointnet2_utils"].sample(num_point, pts)
            pred = tmodel(pts)
        # SmoothClsLoss (classification/util/utils.py:55-69)
        eps = 0.1
        one_hot = torch.zeros_like(pred).scatter(
            1, torch.from_numpy(target).view(-1, 1), 1
        )
        one_hot = one_hot * (1 - eps) + (1 - one_hot) * eps / (15 - 1)
        tloss = -(one_hot * pred).sum(dim=1).mean()
        opt.zero_grad()
        tloss.backward()
        opt.step()

        # losses must agree before the update comparison means anything
        assert abs(float(loss) - float(tloss)) < 1e-3

        sd2 = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
        fresh = jax.tree_util.tree_map(np.copy, pre)
        torch_post = _split_variables(
            ti.import_torch_checkpoint(sd2, fresh, ti.cls_umbrella_mapping())
        )
        # rtol 5e-2 / median 2e-2: measured noise band (seed-11 distribution:
        # 17 above-floor leaves, median 0.92%, max 2.89%) — see
        # _assert_update_parity docstring for the full characterization
        _assert_update_parity(
            pre, ours_post, torch_post, rtol=5e-2, median_rtol=2e-2, label="cls "
        )


class TestSegTrainStepParity:
    def test_repsurf_umb_ssg_sgd_step(self):
        from repsurf_tpu.data.s3dis import CLASS_WEIGHTS
        from repsurf_tpu.train.train_seg import (
            SegConfig,
            create_state,
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
        tmodel.sa1.num_sector = 1  # our sectorizer is a documented deviation
        _zero_dropout(tmodel)

        rng = np.random.RandomState(7)
        sizes = [512, 256]
        pos_list = [
            (rng.rand(s, 3) * np.array([4.0, 4.0, 3.0])).astype(np.float32)
            for s in sizes
        ]
        rgb_list = [rng.rand(s, 3).astype(np.float32) for s in sizes]
        lbl_list = [rng.randint(0, 13, s).astype(np.int64) for s in sizes]
        for lbl in lbl_list:  # a few ignored labels inside the valid region
            lbl[::17] = 255

        weights = np.asarray(CLASS_WEIGHTS[5], np.float32)

        # ---- our side ----
        n_max, b = max(sizes), len(sizes)
        pos = np.zeros((b, n_max, 3), np.float32)
        rgb = np.zeros((b, n_max, 3), np.float32)
        lbl = np.full((b, n_max), 255, np.int64)
        for i, s in enumerate(sizes):
            pos[i, :s] = pos_list[i]
            rgb[i, :s] = rgb_list[i]
            lbl[i, :s] = lbl_list[i]
            pos[i, s:] = 37.0  # poison padding
        valid = np.asarray(sizes, np.int32)

        cfg = SegConfig(
            batch_size=b,
            voxel_max=n_max,
            optimizer="SGD",
            learning_rate=LR,
            momentum=0.0,
            weight_decay=0.0,
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
        pre = _split_variables(variables)
        from repsurf_tpu.models import get_model

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
        batch = {
            "coord": jnp.asarray(pos),
            "feat": jnp.asarray(rgb),
            "label": jnp.asarray(lbl),
            "valid": jnp.asarray(valid),
        }
        new_state, loss, _ = train_step(
            state, batch, jnp.asarray(weights), jax.random.PRNGKey(1), cfg
        )
        ours_post = {
            "params": new_state.params,
            "batch_stats": new_state.batch_stats,
        }

        # ---- torch side: ragged forward -> weighted CE -> SGD ----
        opt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=0.0)
        pos_flat = torch.from_numpy(np.concatenate(pos_list))
        rgb_flat = torch.from_numpy(np.concatenate(rgb_list))
        lbl_flat = torch.from_numpy(np.concatenate(lbl_list))
        offset = torch.tensor(np.cumsum(sizes), dtype=torch.int32)
        criterion = torch.nn.CrossEntropyLoss(
            weight=torch.from_numpy(weights), ignore_index=255
        )
        with torch_ref.patch_seg_cpu(ref["pointops"]):
            tout = tmodel([pos_flat, rgb_flat, offset])
            tloss = criterion(tout, lbl_flat)
            opt.zero_grad()
            tloss.backward()
            opt.step()

        assert abs(float(loss) - float(tloss)) < 2e-4

        sd2 = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
        fresh = jax.tree_util.tree_map(np.copy, pre)
        torch_post = _split_variables(
            ti.import_torch_checkpoint(sd2, fresh, ti.seg_umbrella_mapping())
        )
        _assert_update_parity(pre, ours_post, torch_post, label="seg ")
