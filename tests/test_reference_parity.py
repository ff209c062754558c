"""Differential parity against the installed PyTorch reference.

These tests construct the ACTUAL reference models from /root/reference —
classification via its own cuda=False CPU twins
(classification/modules/pointnet2_utils.py:15-124, model
classification/models/repsurf/repsurf_ssg_umb.py:11-57), segmentation via CPU
oracles of its two CUDA kernels (tests/torch_ref.py) — export their
random-init state dicts through train/torch_import.py, run both frameworks on
the same cloud, and assert output agreement.  Any drift in feature order,
BN semantics, ball-query/kNN/FPS indices, umbrella azimuth sorting, NaN
repair, or the checkpoint mapping fails these tests.

Determinism knobs: eval mode (dropout off, BN running stats), random_inv
disabled on both sides, FPS start pinned to index 0 (the CUDA convention).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from repsurf_tpu.models import get_model
from repsurf_tpu.train import torch_import as ti

from . import torch_ref

pytestmark = pytest.mark.skipif(
    not torch_ref.reference_available(), reason="/root/reference not present"
)


class _Args:
    pass


def _cls_args(num_point):
    a = _Args()
    a.num_point = num_point
    a.num_class = 15
    a.return_dist = True
    a.return_center = True
    a.return_polar = True
    a.group_size = 8
    a.umb_pool = "sum"
    a.cuda_ops = False
    return a


def _unit_cloud(rng, b, n):
    cloud = rng.randn(b, n, 3).astype(np.float32)
    return cloud / np.abs(cloud).max()


def _run_cls_pair(ref_model_mod, our_name, mapping, b=2, n=1024, seed=42):
    torch.manual_seed(0)
    tmodel = ref_model_mod.Model(_cls_args(n))
    tmodel.eval()
    tmodel.surface_constructor.random_inv = False

    cloud = _unit_cloud(np.random.RandomState(seed), b, n)
    with torch_ref.deterministic_fps_start(), torch.no_grad():
        tout = tmodel(torch.from_numpy(cloud.transpose(0, 2, 1))).numpy()

    model = get_model(our_name)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(cloud), train=False
    )
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    variables = ti.import_torch_checkpoint(sd, variables, mapping)
    jout = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(cloud),
            train=False,
        )
    )
    return tout, jout


class TestClsParity:
    def test_repsurf_ssg_umb(self):
        ref = torch_ref.load_tree("classification")
        tout, jout = _run_cls_pair(
            ref["model_umb"], "repsurf.repsurf_ssg_umb", ti.cls_umbrella_mapping()
        )
        assert np.abs(jout - tout).max() < 1e-4
        np.testing.assert_array_equal(jout.argmax(-1), tout.argmax(-1))

    def test_repsurf_ssg_umb_2x(self):
        ref = torch_ref.load_tree("classification")
        tout, jout = _run_cls_pair(
            ref["model_umb_2x"],
            "repsurf.repsurf_ssg_umb_2x",
            ti.cls_umbrella_mapping(n_sa=4, mlp_layers=(3, 3, 3, 3)),
        )
        assert np.abs(jout - tout).max() < 1e-4
        np.testing.assert_array_equal(jout.argmax(-1), tout.argmax(-1))


class TestSegParity:
    def test_repsurf_umb_ssg(self):
        ref = torch_ref.load_tree("segmentation")

        args = _Args()
        args.num_class = 13
        args.in_channel = 6  # cat[xyz, rgb]
        args.return_polar = True
        args.group_size = 8

        torch.manual_seed(0)
        tmodel = ref["model_seg"].Model(args)
        tmodel.eval()
        tmodel.surface_constructor.random_inv = False

        # ragged scene pair; sizes divisible by 4**4 so no stage empties
        rng = np.random.RandomState(7)
        sizes = [512, 256]
        pos_list = [
            (rng.rand(s, 3) * np.array([4.0, 4.0, 3.0])).astype(np.float32)
            for s in sizes
        ]
        rgb_list = [rng.rand(s, 3).astype(np.float32) for s in sizes]

        pos_flat = torch.from_numpy(np.concatenate(pos_list))
        rgb_flat = torch.from_numpy(np.concatenate(rgb_list))
        offset = torch.tensor(np.cumsum(sizes), dtype=torch.int32)
        with torch_ref.patch_seg_cpu(ref["pointops"]), torch.no_grad():
            tout = tmodel([pos_flat, rgb_flat, offset]).numpy()  # [sum(N), 13]

        # padded layout for our side
        n_max = max(sizes)
        b = len(sizes)
        pos = np.zeros((b, n_max, 3), np.float32)
        rgb = np.zeros((b, n_max, 3), np.float32)
        for i, s in enumerate(sizes):
            pos[i, :s] = pos_list[i]
            rgb[i, :s] = rgb_list[i]
            # poison padding: parity must not depend on pad values
            pos[i, s:] = 37.0
        valid = np.asarray(sizes, np.int32)

        model = get_model("repsurf.repsurf_umb_ssg", return_polar=True)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.asarray(pos),
            jnp.asarray(rgb),
            jnp.asarray(valid),
            train=False,
        )
        sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
        variables = ti.import_torch_checkpoint(
            sd, variables, ti.seg_umbrella_mapping()
        )
        jout = np.asarray(
            model.apply(
                {
                    "params": variables["params"],
                    "batch_stats": variables["batch_stats"],
                },
                jnp.asarray(pos),
                jnp.asarray(rgb),
                jnp.asarray(valid),
                train=False,
            )
        )

        start = 0
        for i, s in enumerate(sizes):
            t_seg = tout[start : start + s]
            j_seg = jout[i, :s]
            assert np.abs(j_seg - t_seg).max() < 2e-4, f"sample {i}"
            np.testing.assert_array_equal(j_seg.argmax(-1), t_seg.argmax(-1))
            start += s
