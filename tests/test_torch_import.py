"""Checkpoint-import consistency tests: every mapping entry must resolve to
a real flax leaf with the transposed torch shape, and values must land
exactly (arange payloads catch transpose mistakes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repsurf_tpu.models import get_model
from repsurf_tpu.train import torch_import as ti


def _leaf(tree, path):
    node = tree
    for p in path:
        assert p in node, f"missing {path} at {p}; have {list(node)}"
        node = node[p]
    return node


def _fake_state_dict(variables, mapping):
    """Build a torch-layout state dict with arange payloads shaped from the
    flax tree (inverse of the import transposes)."""
    sd = {}
    for kind, flax_path, torch_name in mapping:
        leaf = _leaf(variables["params"], flax_path)
        if kind == "linear":
            kin, kout = leaf["kernel"].shape
            w = np.arange(kin * kout, dtype=np.float32).reshape(kout, kin)
            sd[torch_name + ".weight"] = w[..., None, None]  # conv-style
            if "bias" in leaf:
                sd[torch_name + ".bias"] = np.arange(kout, dtype=np.float32)
        else:
            c = leaf["scale"].shape[0]
            sd[torch_name + ".weight"] = np.full(c, 2.0, np.float32)
            sd[torch_name + ".bias"] = np.full(c, 3.0, np.float32)
            sd[torch_name + ".running_mean"] = np.full(c, 4.0, np.float32)
            sd[torch_name + ".running_var"] = np.full(c, 5.0, np.float32)
    return sd


class TestClsImport:
    def test_mapping_resolves_and_imports(self):
        model = get_model("repsurf.repsurf_ssg_umb")
        pts = jnp.zeros((1, 32, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
        mapping = ti.cls_umbrella_mapping()
        sd = _fake_state_dict(variables, mapping)
        out = ti.import_torch_checkpoint(sd, variables, mapping)

        # transpose check on one linear: torch w[out,in] -> kernel[in,out]
        k = _leaf(out["params"], ["classifier", "Linear_0"])["kernel"]
        kin, kout = k.shape
        want = np.arange(kin * kout, dtype=np.float32).reshape(kout, kin).T
        np.testing.assert_array_equal(k, want)
        # bn landed in both collections
        bn_p = _leaf(out["params"], ["sa1", "MaskedBatchNorm_0"])
        bn_s = _leaf(out["batch_stats"], ["sa1", "MaskedBatchNorm_0"])
        assert (bn_p["scale"] == 2.0).all() and (bn_s["var"] == 5.0).all()

    def test_every_param_leaf_covered(self):
        """The mapping must touch every Linear kernel and BN scale in the
        model — anything uncovered would silently keep random init."""
        model = get_model("repsurf.repsurf_ssg_umb")
        pts = jnp.zeros((1, 32, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
        mapping = ti.cls_umbrella_mapping()
        sd = _fake_state_dict(variables, mapping)
        out = ti.import_torch_checkpoint(sd, variables, mapping)

        changed, total = 0, 0
        flat_old = jax.tree_util.tree_leaves_with_path(variables["params"])
        new_params = out["params"]
        for path, old in flat_old:
            node = new_params
            for p in path:
                node = node[p.key]
            total += 1
            if not np.array_equal(np.asarray(old), np.asarray(node)):
                changed += 1
        assert changed == total, f"only {changed}/{total} leaves imported"


class TestSegImport:
    def test_mapping_resolves(self):
        model = get_model("repsurf.repsurf_umb_ssg")
        pos = jnp.zeros((1, 256, 3))
        rgb = jnp.zeros((1, 256, 3))
        valid = jnp.full((1,), 256, jnp.int32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, pos, rgb, valid, train=False
        )
        mapping = ti.seg_umbrella_mapping()
        sd = _fake_state_dict(variables, mapping)
        out = ti.import_torch_checkpoint(sd, variables, mapping)

        changed, total = 0, 0
        flat_old = jax.tree_util.tree_leaves_with_path(variables["params"])
        for path, old in flat_old:
            node = out["params"]
            for p in path:
                node = node[p.key]
            total += 1
            if not np.array_equal(np.asarray(old), np.asarray(node)):
                changed += 1
        assert changed == total, f"only {changed}/{total} leaves imported"
