"""Load the PyTorch reference (/root/reference) for differential parity tests.

The classification tree is CPU-runnable by design: every CUDA op has a
pure-PyTorch twin selected by ``cuda=False``
(classification/modules/pointnet2_utils.py:15-124), and the CUDA extension
import is satisfied by stubbing ``pointops_cuda`` in sys.modules (the stub is
never called on the CPU path).

The segmentation tree hard-allocates ``torch.cuda.*Tensor`` inside its op
wrappers (segmentation/modules/pointops/functions/pointops.py:42-43,124-125),
so it has no CPU path of its own.  ``patch_seg_cpu`` makes it CPU-runnable by
(a) replacing the two kernels the RepSurf seg model needs with CPU oracles
written from the kernel semantics —

  * offset FPS: segmentation/modules/pointops/src/sampling/
    sampling_cuda_kernel.cu:14-129 (seed = segment start, running
    min-distance, argmax ties -> lowest index),
  * offset heap-kNN: segmentation/modules/pointops/src/knnquery/
    knnquery_cuda_kernel.cu:65-108 (ascending, pad idx = segment start,
    pad dist2 = 1e10; the Python wrapper returns sqrt(dist2),
    functions/pointops.py:114-130)

— and (b) pointing ``torch.cuda.IntTensor`` / ``FloatTensor`` at CPU
constructors for the two host-side allocations
(segmentation/modules/repsurface_utils.py:22,268).

Both reference trees define the same top-level package names (``models``,
``modules``, ``util``, ``dataset``); ``load_tree`` imports each under a
temporary sys.modules window and hands back direct module references, so both
can be loaded in one process.
"""

import contextlib
import importlib
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"
_TREE_PKGS = ("models", "modules", "util", "dataset")
_cache = {}


def reference_available():
    import os

    return os.path.isdir(REF_ROOT + "/classification")


def load_tree(task):
    """Import a reference sub-tree ('classification' | 'segmentation').

    Returns a dict of the modules the parity tests need.  The tree's entries
    are removed from sys.modules afterwards (the returned module objects keep
    working — their internal imports were resolved during load), so the two
    trees' identically-named packages never collide.
    """
    if task in _cache:
        return _cache[task]
    if "pointops_cuda" not in sys.modules:
        sys.modules["pointops_cuda"] = types.ModuleType("pointops_cuda")

    stash = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k.split(".")[0] in _TREE_PKGS
    }
    root = f"{REF_ROOT}/{task}"
    sys.path.insert(0, root)
    try:
        mods = {}
        if task == "classification":
            mods["model_umb"] = importlib.import_module(
                "models.repsurf.repsurf_ssg_umb"
            )
            mods["model_umb_2x"] = importlib.import_module(
                "models.repsurf.repsurf_ssg_umb_2x"
            )
            mods["pointnet2_utils"] = importlib.import_module(
                "modules.pointnet2_utils"
            )
        else:
            mods["model_seg"] = importlib.import_module(
                "models.repsurf.repsurf_umb_ssg"
            )
            mods["pointops"] = sys.modules["modules.pointops.functions.pointops"]
    finally:
        sys.path.remove(root)
        for k in list(sys.modules):
            if k.split(".")[0] in _TREE_PKGS:
                del sys.modules[k]
        sys.modules.update(stash)
    _cache[task] = mods
    return mods


def cpu_furthestsampling(xyz, offset, new_offset):
    """CPU oracle for the offset-FPS kernel (see module docstring)."""
    import torch

    p_all = xyz.detach().numpy().astype(np.float32)
    out = []
    s_n = s_m = 0
    for e_n, e_m in zip(offset.tolist(), new_offset.tolist()):
        p = p_all[s_n:e_n]
        tmp = np.full(len(p), 1e10, np.float32)
        old = 0
        ids = [0]
        for _ in range(1, e_m - s_m):
            d = ((p - p[old]) ** 2).sum(-1).astype(np.float32)
            tmp = np.minimum(tmp, d)
            old = int(np.argmax(tmp))
            ids.append(old)
        out.extend(i + s_n for i in ids)
        s_n, s_m = e_n, e_m
    return torch.tensor(out, dtype=torch.int32)


def cpu_knnquery(nsample, xyz, new_xyz, offset, new_offset):
    """CPU oracle for the offset heap-kNN kernel (see module docstring)."""
    import torch

    if new_xyz is None:
        new_xyz = xyz
    m = new_xyz.shape[0]
    idx = torch.zeros(m, nsample, dtype=torch.int32)
    dist2 = torch.full((m, nsample), 1e10)
    s_n = s_m = 0
    for e_n, e_m in zip(offset.tolist(), new_offset.tolist()):
        if e_m > s_m and e_n > s_n:
            q = new_xyz[s_m:e_m]
            p = xyz[s_n:e_n]
            # same accumulation order as the kernel: sum of 3 f32 squares
            d2 = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
            k_eff = min(nsample, e_n - s_n)
            d_sorted, order = torch.sort(d2, dim=1, stable=True)
            idx[s_m:e_m, :k_eff] = order[:, :k_eff].int() + s_n
            idx[s_m:e_m, k_eff:] = s_n  # pad with segment start
            dist2[s_m:e_m, :k_eff] = d_sorted[:, :k_eff]
        s_n, s_m = e_n, e_m
    return idx, torch.sqrt(dist2)


@contextlib.contextmanager
def patch_seg_cpu(pointops_mod):
    """Make the seg tree CPU-runnable: CPU kernel oracles + CPU tensor ctors."""
    import torch

    saved = (
        pointops_mod.furthestsampling,
        pointops_mod.knnquery,
        torch.cuda.IntTensor,
        torch.cuda.FloatTensor,
    )
    pointops_mod.furthestsampling = cpu_furthestsampling
    pointops_mod.knnquery = cpu_knnquery
    torch.cuda.IntTensor = lambda *a, **kw: torch.tensor(*a, dtype=torch.int32)
    torch.cuda.FloatTensor = lambda *a: torch.zeros(*a)
    try:
        yield
    finally:
        (
            pointops_mod.furthestsampling,
            pointops_mod.knnquery,
            torch.cuda.IntTensor,
            torch.cuda.FloatTensor,
        ) = saved


@contextlib.contextmanager
def deterministic_fps_start():
    """Pin the classification CPU-FPS random start to index 0 (the CUDA
    kernels' convention, and ours): pointnet2_utils.farthest_point_sample
    seeds with torch.randint (classification/modules/pointnet2_utils.py:66)."""
    import torch

    real = torch.randint

    def zeros(low, high, size, **kw):
        return torch.zeros(size, dtype=kw.get("dtype", torch.long))

    torch.randint = zeros
    try:
        yield
    finally:
        torch.randint = real
