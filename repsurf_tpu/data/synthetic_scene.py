"""Synthetic indoor-scene point clouds for benchmarks and tests.

Real S3DIS rooms are voxel-grid-sampled SURFACES (walls, floor, ceiling,
furniture planes) — not volumetric blobs.  Spatial data structures behave
very differently on the two (per-cell occupancy scales with pitch^2 on
surfaces vs pitch^3 in volumes), so benchmarks fed with gaussian blobs
mis-measure the production path.  This generator lays points on the planes
of a room box plus a few furniture boxes at a controllable spacing with
jitter — matching the reference pipeline's post-voxelization statistics
(segmentation/util/data_util.py:39-43, voxel 0.04 m).
"""

import numpy as np


def synthetic_room(
    n_points,
    size=(8.0, 8.0, 3.0),
    spacing=0.04,
    n_furniture=6,
    rng=None,
):
    """Surface-sampled room cloud: [n_points, 3] float32.

    Points are drawn uniformly from the room's wall/floor/ceiling planes
    and a few random furniture boxes, snapped to a `spacing` grid with
    +-spacing/2 jitter, then exactly n_points are kept (with replacement
    if the surfaces undersample).
    """
    rng = rng or np.random.RandomState(0)
    sx, sy, sz = size

    planes = [
        # (origin, u-vector, v-vector): floor, ceiling, 4 walls
        ((0, 0, 0), (sx, 0, 0), (0, sy, 0)),
        ((0, 0, sz), (sx, 0, 0), (0, sy, 0)),
        ((0, 0, 0), (sx, 0, 0), (0, 0, sz)),
        ((0, sy, 0), (sx, 0, 0), (0, 0, sz)),
        ((0, 0, 0), (0, sy, 0), (0, 0, sz)),
        ((sx, 0, 0), (0, sy, 0), (0, 0, sz)),
    ]
    for _ in range(n_furniture):
        w, d, h = rng.uniform(0.4, 2.0, 3)
        x0 = rng.uniform(0.2, sx - 2.2)
        y0 = rng.uniform(0.2, sy - 2.2)
        planes.append(((x0, y0, h), (w, 0, 0), (0, d, 0)))  # top
        planes.append(((x0, y0, 0), (w, 0, 0), (0, 0, h)))  # sides
        planes.append(((x0, y0, 0), (0, d, 0), (0, 0, h)))

    areas = np.array(
        [np.linalg.norm(np.cross(u, v)) for _, u, v in planes], np.float64
    )
    weights = areas / areas.sum()
    counts = rng.multinomial(n_points, weights)
    pts = []
    for (o, u, v), c in zip(planes, counts):
        if c == 0:
            continue
        a = rng.rand(c, 1)
        b = rng.rand(c, 1)
        p = np.asarray(o) + a * np.asarray(u) + b * np.asarray(v)
        pts.append(p)
    cloud = np.concatenate(pts, axis=0)
    # snap to the voxel pitch + jitter (the post-voxelization look)
    cloud = np.round(cloud / spacing) * spacing
    cloud += rng.uniform(-spacing / 2, spacing / 2, cloud.shape)
    idx = rng.permutation(len(cloud))[:n_points]
    if len(idx) < n_points:
        extra = rng.randint(0, len(cloud), n_points - len(idx))
        idx = np.concatenate([idx, extra])
    return cloud[idx].astype(np.float32)
