#!/usr/bin/env python3
"""Pipelined whole-scene S3DIS inference throughput on one chip.

Times the COMPLETE tools/test_s3dis.py protocol per scene — voxel-pass
construction, potential-field chunking, normalization, padded batched
forwards, softmax vote accumulation and argmax — on surface-sampled
synthetic rooms (data/synthetic_scene.py; real S3DIS is license-gated, see
data/download.py).  Reference analog: the per-scene loop of
segmentation/tool/test_s3dis.py:186-251.

Prints one JSON line: {"metric": "s3dis_infer_scenes_per_sec", ...}.
The reference publishes no inference wall-clock, so vs_baseline is null.

Run on TPU:  python tools/bench_infer_s3dis.py [--scenes 6] [--raw 220000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_forward(cfg, state):
    import jax

    @jax.jit
    def forward(batch):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["coord"],
            batch["feat"],
            batch["valid"],
            train=False,
        )

    return forward


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--raw", type=int, default=220000,
                    help="raw points per synthetic room (pre-voxelization)")
    ap.add_argument("--batch_size", type=int, default=4)
    args = ap.parse_args()

    import jax

    from repsurf_tpu.data.synthetic_scene import synthetic_room
    from repsurf_tpu.train.eval_s3dis import predict_scene
    from repsurf_tpu.train.train_seg import SegConfig, create_state
    from repsurf_tpu.utils.platform import enable_compilation_cache

    # the [B, 80k] eval forward is a ~10 min XLA compile; persist it so only
    # the first process on this host ever pays it
    enable_compilation_cache()

    cfg = SegConfig()
    state = create_state(cfg, n_points=1024, key=jax.random.PRNGKey(0))
    forward = build_forward(cfg, state)

    rng = np.random.RandomState(0)
    scenes = []
    for _ in range(args.scenes):
        coord = synthetic_room(args.raw, rng=rng)
        feat = (rng.rand(args.raw, 3) * 255.0).astype(np.float32)
        scenes.append((coord, feat))

    def run(coord, feat):
        pred = predict_scene(
            forward,
            coord,
            feat,
            cfg.num_class,
            voxel_size=cfg.voxel_size,
            voxel_max=cfg.voxel_max,
            batch_size=args.batch_size,
            data_norm=cfg.data_norm,
        )
        return pred

    # warmup: compiles the bucketed forward shapes
    run(*scenes[0])

    t0 = time.perf_counter()
    npts = 0
    for coord, feat in scenes:
        pred = run(coord, feat)
        npts += pred.shape[0]
    dt = time.perf_counter() - t0
    sps = args.scenes / dt

    dev_sps = device_compute_scenes_per_sec(cfg, forward, scenes, args.batch_size)
    print(
        f"# {args.scenes} scenes x {args.raw} raw pts in {dt:.2f}s "
        f"({npts / dt / 1e6:.2f} M raw pts/sec); device-compute-only "
        f"{dev_sps:.3f} scenes/sec",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "s3dis_infer_scenes_per_sec",
        "value": round(sps, 3),
        # forward+vote-scatter with all chunk batches pre-staged on device:
        # what the chip itself sustains.  The wall number above includes the
        # axon tunnel's 33 MB/s host->device uploads, which a production
        # host would not pay — regressions in device compute must not hide
        # under (or be blamed on) the tunnel.
        "device_compute_value": round(dev_sps, 3),
        "status": "ok",
        "unit": "scenes/sec/chip",
        "vs_baseline": None,
    }))


def device_compute_scenes_per_sec(cfg, forward, scenes, batch_size):
    """Time ONLY the jitted forwards + vote scatters, with every chunk batch
    of every scene already resident on device: dispatch all batches, sync
    once by reading back the final vote argmax."""
    import jax
    import jax.numpy as jnp

    from repsurf_tpu.data.s3dis import pad_batch
    from repsurf_tpu.train.eval_s3dis import (
        _get_scatter_votes,
        chunk_scene,
        voxel_passes,
    )

    bucket = 4096
    staged_scenes = []
    for coord, feat in scenes:
        passes = voxel_passes(coord, cfg.voxel_size)
        idx_list, coord_list, feat_list = chunk_scene(
            coord, feat, passes, cfg.voxel_max, cfg.data_norm, seed=1000
        )
        n_max = max(c.shape[0] for c in coord_list)
        n_max = min(((n_max + bucket - 1) // bucket) * bucket, cfg.voxel_max)
        n_scene = coord.shape[0]
        n_pad = ((n_scene + bucket - 1) // bucket) * bucket
        batches = []
        for s in range(0, len(idx_list), batch_size):
            chunk_idx = idx_list[s : s + batch_size]
            samples = [
                (coord_list[s + j], feat_list[s + j], None)
                for j in range(len(chunk_idx))
            ]
            idx_rows = [
                np.pad(gi.astype(np.int64), (0, n_max - len(gi)),
                       constant_values=n_pad + 1)
                for gi in chunk_idx
            ]
            while len(samples) < batch_size:
                samples.append(samples[-1])
                idx_rows.append(np.full((n_max,), n_pad + 1, np.int64))
            batches.append(
                (
                    jax.device_put(pad_batch(samples, n_max)),
                    jax.device_put(np.stack(idx_rows)),
                )
            )
        staged_scenes.append((n_scene, n_pad, batches))

    scatter = _get_scatter_votes()

    def run_all():
        last = None
        for n_scene, n_pad, batches in staged_scenes:
            pred_d = jnp.zeros((n_pad + 1, cfg.num_class), jnp.float32)
            cnt_d = jnp.zeros((n_pad + 1,), jnp.float32)
            for batch, idx_pad in batches:
                logits = forward(batch)
                pred_d, cnt_d = scatter(pred_d, cnt_d, logits, idx_pad)
            last = jnp.argmax(
                pred_d[:n_scene] / jnp.maximum(cnt_d[:n_scene, None], 1.0), -1
            )
        return last

    np.asarray(run_all())  # warmup (scatter shapes) + sync
    t0 = time.perf_counter()
    np.asarray(run_all())  # one host readback at the end: device time only
    dt = time.perf_counter() - t0
    return len(staged_scenes) / dt


if __name__ == "__main__":
    main()
