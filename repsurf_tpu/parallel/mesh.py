"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's entire distributed stack
(mp.spawn + NCCL DDP + DistributedSampler + explicit all_reduce,
segmentation/tool/train.py:106-150,293-303 — SURVEY.md §2g): a 1-D ``data``
mesh, batches sharded over it, parameters replicated, and XLA inserting the
gradient/metric collectives over ICI during jit compilation.

Because the batch-norm statistics are computed with global reductions inside
the jitted step, sharded execution gives SyncBatchNorm semantics by
construction (the reference's optional --sync_bn); per-device BN is available
via the shard_map path with axis_name set on the model.
"""

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = mesh_utils.create_device_mesh((len(devices),), devices=devices)
    return Mesh(arr, (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put every leaf with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """device_put every leaf fully replicated."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch, multiple, ignore_index=255):
    """Pad the leading batch axis of a host batch dict to a device-count
    multiple (the per-host analog of DistributedSampler's padding).  Added
    samples have valid=0 and all-ignore labels, so they contribute nothing."""
    leaves = jax.tree_util.tree_leaves(batch)
    b = leaves[0].shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return batch

    def pad(x):
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width)

    out = {k: pad(v) for k, v in batch.items()}
    if "label" in out:
        out["label"][b:] = ignore_index
    if "valid" in out:
        out["valid"][b:] = 0
    return out
