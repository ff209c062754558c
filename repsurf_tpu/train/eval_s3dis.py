"""Whole-scene S3DIS evaluation: exhaustive multi-pass voxel passes,
potential-field chunking, overlapping-chunk vote accumulation, kNN median
filtering, and visualization dumps.

Re-designs segmentation/tool/test_s3dis.py:105-256 for the padded batch
layout: the host-side protocol (voxel pass construction, chunk cropping,
normalization, vote accumulation) stays NumPy — it is data-dependent control
flow — while every forward pass and the median filter run as fixed-shape
jitted device computations.
"""

import os
from collections import OrderedDict

import numpy as np

from ..data.s3dis import S3DIS_RGB_MEAN, S3DIS_RGB_STD, pad_batch
from ..data.voxelize import voxelize
from ..ops.neighbors import knn

# class palette for visualization dumps (test_s3dis.py:25-31)
LABEL2COLOR = OrderedDict(
    [
        ("ceiling", [0, 255, 0]),
        ("floor", [0, 0, 255]),
        ("wall", [0, 255, 255]),
        ("beam", [255, 255, 0]),
        ("column", [255, 0, 255]),
        ("window", [100, 100, 255]),
        ("door", [200, 200, 100]),
        ("chair", [170, 120, 200]),
        ("table", [255, 0, 0]),
        ("bookcase", [200, 100, 100]),
        ("sofa", [10, 200, 100]),
        ("board", [200, 200, 200]),
        ("clutter", [50, 50, 50]),
    ]
)
LABEL2CLASS = list(LABEL2COLOR.keys())
PALETTE = np.array(list(LABEL2COLOR.values()), dtype=np.int64)


def voxel_passes(coord, voxel_size):
    """Index sets that jointly cover every point: pass i takes the i-th point
    of every voxel (test_s3dis.py:114-130)."""
    if not voxel_size:
        return [np.arange(coord.shape[0])]
    idx_sort, count = voxelize(coord - np.min(coord, 0), voxel_size, mode=1)
    passes = []
    for i in range(count.max()):
        idx_select = np.cumsum(np.insert(count, 0, 0)[0:-1]) + i % count
        passes.append(idx_sort[idx_select])
    return passes


def input_normalize(coord, feat, data_norm="mean",
                    rgb_mean=S3DIS_RGB_MEAN, rgb_std=S3DIS_RGB_STD):
    """Per-chunk normalization (test_s3dis.py:162-174)."""
    if data_norm == "mean":
        coord = coord - np.mean(coord, 0)
    elif data_norm == "min":
        coord = coord - np.min(coord, 0)
    else:
        raise ValueError(data_norm)
    feat = feat / 255.0
    if rgb_mean is not None and rgb_std is not None:
        feat = (feat - rgb_mean) / rgb_std
    return coord.astype(np.float32), feat.astype(np.float32)


def chunk_scene(coord, feat, idx_data, voxel_max=80000, data_norm="mean", seed=None):
    """Potential-field chunk cropper (test_s3dis.py:133-159): repeatedly crop
    voxel_max points around the lowest-potential point, raising the potential
    of cropped points, until every index of the pass is covered.

    Returns lists of (global_idx, coord, feat) chunks.
    """
    rng = np.random.RandomState(seed) if seed is not None else np.random
    idx_list, coord_list, feat_list = [], [], []
    for idx_part in idx_data:
        coord_part, feat_part = coord[idx_part], feat[idx_part]
        if voxel_max and coord_part.shape[0] > voxel_max:
            potential = rng.rand(coord_part.shape[0]) * 1e-3
            covered = np.array([], dtype=idx_part.dtype)
            while covered.size != idx_part.shape[0]:
                init_idx = np.argmin(potential)
                dist = np.sum(np.square(coord_part - coord_part[init_idx]), 1)
                idx_crop = np.argsort(dist)[:voxel_max]
                dist_c = dist[idx_crop]
                potential[idx_crop] += np.square(1 - dist_c / np.max(dist_c))
                c, f = input_normalize(
                    coord_part[idx_crop].copy(), feat_part[idx_crop].copy(), data_norm
                )
                idx_list.append(idx_part[idx_crop])
                coord_list.append(c)
                feat_list.append(f)
                covered = np.unique(np.concatenate((covered, idx_part[idx_crop])))
        else:
            c, f = input_normalize(coord_part.copy(), feat_part.copy(), data_norm)
            idx_list.append(idx_part)
            coord_list.append(c)
            feat_list.append(f)
    return idx_list, coord_list, feat_list


def _scatter_votes_impl(pred, cnt, logits, idx_pad):
    """Scatter-add one batch of softmax votes into the scene buffers
    (module-level jit: per-scene buffer-size changes only re-trace this
    tiny graph, never the 80k forward; out-of-range rows drop)."""
    import jax
    import jax.numpy as jnp

    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    flat_idx = idx_pad.reshape(-1)
    flat_p = probs.reshape(-1, probs.shape[-1])
    pred = pred.at[flat_idx].add(flat_p, mode="drop")
    cnt = cnt.at[flat_idx].add(1.0, mode="drop")
    return pred, cnt


_scatter_votes = None  # lazily jitted (jax import kept off module import)


def _get_scatter_votes():
    global _scatter_votes
    if _scatter_votes is None:
        import jax

        _scatter_votes = jax.jit(_scatter_votes_impl, donate_argnums=(0, 1))
    return _scatter_votes


def predict_scene(
    forward_fn,
    coord,
    feat,
    num_class,
    voxel_size=0.04,
    voxel_max=80000,
    batch_size=4,
    data_norm="mean",
    seed=1000,
    accumulate="auto",
):
    """Vote-accumulate softmax predictions over all chunks of one scene.

    Args:
      forward_fn: callable(batch_dict) -> [B, n_max, num_class] logits
        (a jitted eval forward over the padded layout).
      coord/feat: [N, 3] raw scene arrays (feat in 0..255 RGB).
      accumulate: 'host' keeps the reference-shaped numpy accumulation
        (one [B, n_max, C] logits readback per batch); 'device' keeps the
        vote buffer ON the accelerator (scatter-add per batch, one [N]
        label readback per scene) — the TPU-native form of the CUDA
        pred[idx]+=p loop (test_s3dis.py:203-221).  The two differ only
        in f32 summation order.  'auto' = device on TPU.

    Returns:
      pred_choice: [N] int argmax of vote-averaged softmax.
    """
    import jax
    import jax.numpy as jnp

    passes = voxel_passes(coord, voxel_size)
    idx_list, coord_list, feat_list = chunk_scene(
        coord, feat, passes, voxel_max, data_norm, seed=seed
    )
    n_max = max(c.shape[0] for c in coord_list)
    # bucket to a multiple of 4096 to bound recompiles across scenes
    bucket = 4096
    n_max = ((n_max + bucket - 1) // bucket) * bucket
    n_max = min(n_max, voxel_max) if voxel_max else n_max

    if accumulate == "auto":
        accumulate = "device" if jax.default_backend() == "tpu" else "host"

    n_scene = coord.shape[0]
    if accumulate == "device":
        # scene-sized vote buffers stay on device; padded chunk slots and
        # replicated tail samples scatter into out-of-range indices
        # (mode='drop').  The forward stays in ITS OWN stable jit (the
        # caller's) — the scatter is a separate, cheap-to-compile jit, so
        # per-scene n_pad changes never recompile the 80k forward.
        n_pad = ((n_scene + bucket - 1) // bucket) * bucket

        def stage(s):
            """Build chunk batch s..s+B on the host and START its H2D copy
            (jax.device_put is asynchronous) — called right after the
            previous forward is dispatched, so the upload of batch i+1
            rides under the compute of batch i instead of serializing with
            it (the axon tunnel's 33 MB/s link makes this overlap the
            difference between link-bound and compute-bound inference)."""
            chunk_idx = idx_list[s : s + batch_size]
            samples = [
                (coord_list[s + j], feat_list[s + j], None)
                for j in range(len(chunk_idx))
            ]
            idx_rows = [
                np.pad(
                    gi.astype(np.int64), (0, n_max - len(gi)),
                    constant_values=n_pad + 1,  # out of range -> dropped
                )
                for gi in chunk_idx
            ]
            while len(samples) < batch_size:
                samples.append(samples[-1])
                idx_rows.append(np.full((n_max,), n_pad + 1, np.int64))
            batch = jax.device_put(pad_batch(samples, n_max))
            idx_pad = jax.device_put(np.stack(idx_rows))
            return batch, idx_pad

        pred_d = jnp.zeros((n_pad + 1, num_class), jnp.float32)
        cnt_d = jnp.zeros((n_pad + 1,), jnp.float32)
        starts = list(range(0, len(idx_list), batch_size))
        staged = stage(starts[0])
        for i, s in enumerate(starts):
            batch, idx_pad = staged
            logits = forward_fn(batch)  # dispatched, stays on device
            if i + 1 < len(starts):
                staged = stage(starts[i + 1])  # upload under the compute
            pred_d, cnt_d = _get_scatter_votes()(
                pred_d, cnt_d, logits, idx_pad
            )

        choice = jnp.argmax(
            pred_d[:n_scene] / jnp.maximum(cnt_d[:n_scene, None], 1.0), -1
        )
        return np.asarray(choice)

    pred = np.zeros((n_scene, num_class), np.float64)
    pred_count = np.zeros((n_scene, 1), np.float64)
    for s in range(0, len(idx_list), batch_size):
        chunk_idx = idx_list[s : s + batch_size]
        samples = [
            (coord_list[s + j], feat_list[s + j], None)
            for j in range(len(chunk_idx))
        ]
        while len(samples) < batch_size:  # pad the last batch
            # replicated samples cost nothing extra under static shapes (a
            # smaller tail batch would trigger a fresh XLA compile worth far
            # more than the duplicated forward) and their probabilities are
            # never accumulated — the loop below walks chunk_idx only
            samples.append(samples[-1])
        batch = pad_batch(samples, n_max)
        logits = np.asarray(forward_fn(batch))
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        for j, gi in enumerate(chunk_idx):
            n = len(gi)
            pred[gi] += probs[j, :n]
            pred_count[gi] += 1.0
    return np.argmax(pred / np.maximum(pred_count, 1.0), 1)


def median_filter(coord, labels, group_size=32, chunk=512):
    """kNN median relabeling (segmentation/util/utils.py:235-245): each point
    takes the median label of its group_size nearest neighbors.  Runs the
    kNN on device in query chunks."""
    import jax.numpy as jnp

    coord_j = jnp.asarray(coord[None], jnp.float32)
    idx, _ = knn(group_size, coord_j, coord_j, chunk=chunk)
    group = labels[np.asarray(idx[0])]  # [N, k]
    # torch.median picks the lower middle order statistic for even k
    # (utils.py:244) — replicate exactly, don't average like np.median
    return np.sort(group, axis=1)[:, (group_size - 1) // 2].astype(labels.dtype)


def visualize_scene(result_dir, name, coord, pred, label):
    """Dump colored xyz text files (test_s3dis.py:177-183)."""
    os.makedirs(result_dir, exist_ok=True)
    color_pred = PALETTE[pred.astype(np.int64)]
    color_gt = PALETTE[label.astype(np.int64)]
    np.savetxt(
        os.path.join(result_dir, f"{name}_pred.txt"),
        np.hstack([coord, color_pred]),
        fmt="%f " * 3 + "%d " * 3,
    )
    np.savetxt(
        os.path.join(result_dir, f"{name}_label.txt"),
        np.hstack([coord, color_gt]),
        fmt="%f " * 3 + "%d " * 3,
    )
