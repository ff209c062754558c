#!/usr/bin/env python3
"""Segmentation throughput benchmark: full train step at S3DIS production
shape (batch 2 x 80000 points) on the local accelerator.  Prints one JSON
line like bench.py (which remains the driver's classification benchmark).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# reference: 9.18 h / 100 epochs / ~1016 steps at global batch 8 on 4x3090
# => 0.325 s/step => 24.6 samples/sec total => 6.15 samples/sec per GPU
REFERENCE_3090_SAMPLES_PER_SEC_PER_GPU = 6.15


def main():
    import jax
    import jax.numpy as jnp

    from repsurf_tpu.data.s3dis import CLASS_WEIGHTS, pad_batch
    from repsurf_tpu.train.train_seg import SegConfig, create_state, train_step

    from repsurf_tpu.data.synthetic_scene import synthetic_room

    n, b = 80000, 2
    cfg = SegConfig(voxel_max=n, batch_size=b)
    state = create_state(cfg, n_points=n, key=jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    # surface-sampled rooms: spatial pruning behaves like production S3DIS
    # (voxelized surfaces), which gaussian blobs misrepresent
    samples = [
        (
            synthetic_room(n, rng=rng),
            rng.rand(n, 3).astype(np.float32),
            rng.randint(0, 13, n).astype(np.int64),
        )
        for _ in range(b)
    ]
    batch = {k: jnp.asarray(v) for k, v in pad_batch(samples, n).items()}
    w = jnp.asarray(CLASS_WEIGHTS[5], jnp.float32)

    state, loss, _ = train_step(state, batch, w, jax.random.PRNGKey(1), cfg)
    _ = float(loss)  # sync

    times = []
    for i in range(6):
        t0 = time.perf_counter()
        state, loss, _ = train_step(state, batch, w, jax.random.PRNGKey(i + 2), cfg)
        _ = float(loss)
        times.append(time.perf_counter() - t0)

    sps = b / float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "s3dis_train_samples_per_sec_per_chip",
                "value": round(sps, 3),
                "unit": "scenes/sec",
                "vs_baseline": round(sps / REFERENCE_3090_SAMPLES_PER_SEC_PER_GPU, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
