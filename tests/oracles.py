"""Pure-NumPy oracle implementations of the point ops.

These mirror the reference semantics (CUDA kernels + CPU fallbacks in
classification/modules/pointnet2_utils.py) literally — O(N^2) loops are fine,
they only run on tiny test inputs.  They are the ground truth the JAX/Pallas
ops are property-tested against, playing the role of the reference's
``cuda=False`` twin implementations (SURVEY.md §4).
"""

import numpy as np


def fps_oracle(xyz, npoint, valid=None):
    """Deterministic FPS: seed index 0, running min-distance, argmax."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        n = N if valid is None else int(valid[b])
        tmp = np.full(N, 1e10)
        far = 0
        for i in range(npoint):
            out[b, i] = far
            d2 = np.sum((xyz[b] - xyz[b, far]) ** 2, axis=-1)
            tmp = np.minimum(tmp, d2)
            cand = np.where(np.arange(N) < n, tmp, -1.0)
            far = int(np.argmax(cand))
    return out


def knn_oracle(k, xyz, new_xyz, valid=None):
    """Exact kNN sorted ascending; ties by lower index; pad with (0, 1e10)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, k), dtype=np.int32)
    dist = np.zeros((B, M, k), dtype=np.float64)
    for b in range(B):
        n = N if valid is None else int(valid[b])
        d2 = np.sum((new_xyz[b][:, None] - xyz[b][None, :n]) ** 2, axis=-1)
        for m in range(M):
            order = np.argsort(d2[m], kind="stable")[:k]
            dd = d2[m][order]
            kk = len(order)
            idx[b, m, :kk] = order
            dist[b, m, :kk] = np.sqrt(dd)
            if kk < k:
                idx[b, m, kk:] = 0
                dist[b, m, kk:] = np.sqrt(1e10)
    return idx, dist


def ball_query_oracle(radius, nsample, xyz, new_xyz, valid=None):
    """First <=nsample in-radius points in index order; pad with first hit."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    out = np.zeros((B, M, nsample), dtype=np.int32)
    for b in range(B):
        n = N if valid is None else int(valid[b])
        for m in range(M):
            d2 = np.sum((xyz[b, :n] - new_xyz[b, m]) ** 2, axis=-1)
            hits = np.where(d2 <= radius * radius)[0][:nsample]
            if len(hits) == 0:
                out[b, m] = 0
            else:
                row = np.full(nsample, hits[0], dtype=np.int32)
                row[: len(hits)] = hits
                out[b, m] = row
    return out


def interpolate_oracle(xyz_src, xyz_dst, feat_src, valid_src=None, k=3):
    idx, dist = knn_oracle(k, xyz_src, xyz_dst, valid=valid_src)
    recip = 1.0 / (dist + 1e-8)
    w = recip / recip.sum(-1, keepdims=True)
    B, N, _ = idx.shape
    out = np.zeros((B, N, feat_src.shape[-1]))
    for b in range(B):
        out[b] = (feat_src[b][idx[b]] * w[b][..., None]).sum(1)
    return out


def xyz2sphere_oracle(xyz, normalize=True):
    rho = np.sqrt((xyz**2).sum(-1, keepdims=True))
    with np.errstate(invalid="ignore", divide="ignore"):
        theta = np.arccos(np.clip(xyz[..., 2:3] / rho, -1, 1))
    theta = np.where(rho == 0, 0.0, theta)
    phi = np.arctan2(xyz[..., 1:2], xyz[..., 0:1])
    if normalize:
        theta = theta / np.pi
        phi = phi / (2 * np.pi) + 0.5
    return np.concatenate([rho, theta, phi], -1)


def normal_oracle(group_xyz, is_group=True):
    """Torch cal_normal without random inversion; returns (unit, nan_mask)."""
    e1 = group_xyz[..., 1, :] - group_xyz[..., 0, :]
    e2 = group_xyz[..., 2, :] - group_xyz[..., 0, :]
    nor = np.cross(e1, e2)
    norm = np.linalg.norm(nor, axis=-1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        unit = nor / norm
    if is_group:
        ref_x = unit[..., 0:1, 0]
    else:
        ref_x = unit[..., 0]
    with np.errstate(invalid="ignore"):
        sign = np.where(ref_x > 0, 1.0, -1.0)
    unit = unit * sign[..., None]
    return unit, np.squeeze(norm, -1) == 0
