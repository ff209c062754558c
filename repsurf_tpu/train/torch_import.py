"""Import reference PyTorch checkpoints into repsurf_tpu parameter trees.

Enables checkpoint-level parity verification against the reference
(classification best_model.pth dicts, train_cls_scanobjectnn.py:261-271;
segmentation model_best.pth {'state_dict'} dicts, tool/train.py:246-253).
The DataParallel/DDP 'module.' prefix is stripped (as tool/test_s3dis.py:92-97
does) and each torch tensor is transposed into the channels-last layout:

  1x1 ConvNd weight [out, in, 1(,1)] -> kernel [in, out]
  Linear weight [out, in]            -> kernel [in, out]
  BatchNorm weight/bias              -> scale/bias
  BatchNorm running_mean/var         -> batch_stats mean/var

Mapping tables pair reference module paths with flax module paths; they
follow the construction order of the flax blocks (Linear_0 = first Linear
created inside a block, etc.).
"""

import numpy as np


def _strip_module_prefix(state_dict):
    out = {}
    for k, v in state_dict.items():
        out[k[7:] if k.startswith("module.") else k] = v
    return out


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path):
    """Load a reference .pth file -> {name: ndarray} with prefix stripped."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: _np(v) for k, v in _strip_module_prefix(ckpt).items()}


def _conv_kernel(w):
    w = np.asarray(w)
    while w.ndim > 2:  # drop trailing 1x1 spatial dims
        w = w[..., 0]
    return w.T  # [out, in] -> [in, out]


def _copy(x):
    # np.array (NOT np.asarray): state dicts exported via tensor.numpy()
    # SHARE storage with the live torch parameters — without a copy, a later
    # optimizer.step() silently mutates the imported tree (this corrupted the
    # first train-step parity comparison; see tests/test_train_parity.py)
    return np.array(x, np.float32)


def _assign_linear(params, flax_path, sd, torch_name):
    node = params
    for p in flax_path[:-1]:
        node = node[p]
    leaf = node[flax_path[-1]]
    leaf["kernel"] = _copy(_conv_kernel(sd[torch_name + ".weight"]))
    if torch_name + ".bias" in sd and "bias" in leaf:
        leaf["bias"] = _copy(sd[torch_name + ".bias"])


def _assign_bn(params, batch_stats, flax_path, sd, torch_name):
    p_node, s_node = params, batch_stats
    for p in flax_path[:-1]:
        p_node = p_node[p]
        s_node = s_node[p]
    p_leaf, s_leaf = p_node[flax_path[-1]], s_node[flax_path[-1]]
    p_leaf["scale"] = _copy(sd[torch_name + ".weight"])
    p_leaf["bias"] = _copy(sd[torch_name + ".bias"])
    s_leaf["mean"] = _copy(sd[torch_name + ".running_mean"])
    s_leaf["var"] = _copy(sd[torch_name + ".running_var"])


def _to_mutable(tree):
    if hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)


def _shared_mlp_entries(scope, torch_scope, n_layers, start=0):
    """Reference mlp_convs/mlp_bns lists -> our SharedMLP_0 Linears/BNs."""
    entries = []
    for i in range(n_layers):
        entries.append(
            ("linear", scope + ["SharedMLP_0", f"Linear_{i}"],
             f"{torch_scope}.mlp_convs.{start + i}")
        )
        entries.append(
            ("bn", scope + ["SharedMLP_0", f"MaskedBatchNorm_{i}"],
             f"{torch_scope}.mlp_bns.{start + i}")
        )
    return entries


def cls_umbrella_mapping(n_sa=3, mlp_layers=(3, 3, 3)):
    """Mapping for repsurf_ssg_umb(-style) classifiers.

    Flax construction order inside the blocks (models/repsurf_cls.py,
    nn/blocks.py): umbrella = Linear_0/BN_0/Linear_1/BN_1/Linear_2; SA-CD =
    Linear_0(pos branch)/BN_0/Linear_1(feat branch)/BN_1/SharedMLP_0; head =
    Linear_0/BN_0/Linear_1/BN_1/Linear_2.
    """
    entries = [
        ("linear", ["surface_constructor", "Linear_0"], "surface_constructor.mlps.0"),
        ("bn", ["surface_constructor", "MaskedBatchNorm_0"], "surface_constructor.mlps.1"),
        ("linear", ["surface_constructor", "Linear_1"], "surface_constructor.mlps.3"),
        ("bn", ["surface_constructor", "MaskedBatchNorm_1"], "surface_constructor.mlps.4"),
        ("linear", ["surface_constructor", "Linear_2"], "surface_constructor.mlps.6"),
    ]
    for s in range(1, n_sa + 1):
        scope = [f"sa{s}"]
        t = f"sa{s}"
        entries += [
            ("linear", scope + ["Linear_0"], t + ".mlp_l0"),
            ("bn", scope + ["MaskedBatchNorm_0"], t + ".bn_l0"),
            ("linear", scope + ["Linear_1"], t + ".mlp_f0"),
            ("bn", scope + ["MaskedBatchNorm_1"], t + ".bn_f0"),
        ]
        entries += _shared_mlp_entries(scope, t, mlp_layers[s - 1] - 1)
    # head: reference nn.Sequential indices 0,1,4,5,8 (classfier, sic)
    entries += [
        ("linear", ["classifier", "Linear_0"], "classfier.0"),
        ("bn", ["classifier", "MaskedBatchNorm_0"], "classfier.1"),
        ("linear", ["classifier", "Linear_1"], "classfier.4"),
        ("bn", ["classifier", "MaskedBatchNorm_1"], "classfier.5"),
        ("linear", ["classifier", "Linear_2"], "classfier.8"),
    ]
    return entries


def seg_umbrella_mapping(n_sa=4, n_fp=4, sa_layers=3, fp_layers=(2, 2, 2, 3)):
    """Mapping for repsurf_umb_ssg segmentation checkpoints."""
    entries = [
        ("linear", ["surface_constructor", "Linear_0"], "surface_constructor.mlps.0"),
        ("bn", ["surface_constructor", "MaskedBatchNorm_0"], "surface_constructor.mlps.1"),
        ("linear", ["surface_constructor", "Linear_1"], "surface_constructor.mlps.3"),
    ]
    for s in range(1, n_sa + 1):
        scope = [f"sa{s}"]
        t = f"sa{s}"
        entries += [
            ("linear", scope + ["Linear_0"], t + ".mlp_l0"),
            ("bn", scope + ["MaskedBatchNorm_0"], t + ".bn_l0"),
            ("linear", scope + ["Linear_1"], t + ".mlp_f0"),
            ("bn", scope + ["MaskedBatchNorm_1"], t + ".bn_f0"),
        ]
        entries += _shared_mlp_entries(scope, t, sa_layers - 1)
    for f in range(1, n_fp + 1):
        scope = [f"fp{f}"]
        t = f"fp{f}"
        # FP-CD flax order: Linear_0(f0)/BN_0, [Linear_1(skip)/BN_1,] SharedMLP_0
        entries += [
            ("linear", scope + ["Linear_0"], t + ".mlp_f0"),
            ("bn", scope + ["MaskedBatchNorm_0"], t + ".norm_f0"),
        ]
        has_skip = f > 1  # fp1 has no skip branch
        if has_skip:
            entries += [
                ("linear", scope + ["Linear_1"], t + ".mlp_s0"),
                ("bn", scope + ["MaskedBatchNorm_1"], t + ".norm_s0"),
            ]
        n_rest = fp_layers[n_fp - f] - 1
        entries += _shared_mlp_entries(scope, t, n_rest)
    entries += [
        ("linear", ["classifier", "Linear_0"], "classifier.0"),
        ("bn", ["classifier", "MaskedBatchNorm_0"], "classifier.1"),
        ("linear", ["classifier", "Linear_1"], "classifier.4"),
    ]
    return entries


def import_torch_checkpoint(state_dict, variables, mapping):
    """Apply a mapping to a loaded torch state dict.

    Args:
      state_dict: {torch name: ndarray} (see load_torch_state_dict).
      variables: {'params': ..., 'batch_stats': ...} from model.init.
      mapping: list of ('linear'|'bn', flax_path, torch_name).

    Returns:
      new {'params', 'batch_stats'} dict with imported values (numpy).
    """
    params = _to_mutable(variables["params"])
    batch_stats = _to_mutable(variables["batch_stats"])
    for kind, flax_path, torch_name in mapping:
        if kind == "linear":
            _assign_linear(params, flax_path, state_dict, torch_name)
        elif kind == "bn":
            _assign_bn(params, batch_stats, flax_path, state_dict, torch_name)
        else:
            raise ValueError(kind)
    return {"params": params, "batch_stats": batch_stats}
