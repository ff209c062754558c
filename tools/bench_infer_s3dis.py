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
    print(
        f"# {args.scenes} scenes x {args.raw} raw pts in {dt:.2f}s "
        f"({npts / dt / 1e6:.2f} M raw pts/sec)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "s3dis_infer_scenes_per_sec",
        "value": round(sps, 3),
        "unit": "scenes/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
