#!/usr/bin/env python3
"""Whole-scene S3DIS evaluation CLI — the TPU counterpart of
segmentation/tool/test_s3dis.py (multi-pass voxel coverage, potential-field
chunking, vote accumulation, optional kNN median filter and visualization).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser("RepSurf-TPU S3DIS test")
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--data_dir", type=str, default="./data/S3DIS/trainval_fullarea")
    p.add_argument("--log_root", type=str, default="./log")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--model", default="repsurf.repsurf_umb_ssg")
    p.add_argument("--seed", type=int, default=1000)
    p.add_argument("--batch_size_test", type=int, default=4)
    p.add_argument("--test_area", type=int, default=5)
    p.add_argument("--filter", action="store_true", default=False)
    p.add_argument("--data_norm", type=str, default="mean")
    p.add_argument("--visual", action="store_true", default=False)
    p.add_argument("--group_size", type=int, default=8)
    p.add_argument("--return_polar", action="store_true", default=False)
    p.add_argument("--voxel_max", type=int, default=80000)
    p.add_argument("--voxel_size", type=float, default=0.04)
    p.add_argument("--synthetic", action="store_true", default=False,
                   help="evaluate on labeled synthetic rooms (no dataset)")
    p.add_argument("--synthetic_rooms", type=int, default=3)
    p.add_argument("--synthetic_raw", type=int, default=120000)
    p.add_argument("--synthetic_seed", type=int, default=2000,
                   help="must match the trainer's --seed so the val rooms "
                        "are the same universe")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from repsurf_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    from repsurf_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from repsurf_tpu.nn.metrics import iou_from_counts
    from repsurf_tpu.train.checkpoint import BestCheckpointer
    from repsurf_tpu.train.eval_s3dis import (
        LABEL2CLASS,
        median_filter,
        predict_scene,
        visualize_scene,
    )
    from repsurf_tpu.train.train_seg import SegConfig, create_state
    from repsurf_tpu.utils import get_logger

    cfg = SegConfig(
        model=args.model,
        test_area=args.test_area,
        group_size=args.group_size,
        return_polar=args.return_polar,
        voxel_max=args.voxel_max,
        voxel_size=args.voxel_size,
        data_norm=args.data_norm,
    )
    exp = os.path.join(args.log_root, "S3DIS", args.log_dir or "default")
    logger = get_logger(os.path.join(exp, "logs"), "test_s3dis")
    logger.info(cfg)

    state = create_state(cfg, n_points=1024, key=jax.random.PRNGKey(cfg.seed))
    ckpt = BestCheckpointer(os.path.join(exp, "checkpoints"))
    template = {"params": state.params, "batch_stats": state.batch_stats}
    if args.model_path or ckpt.exists():
        restored = ckpt.restore(template, partial=True)
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        logger.info("checkpoint restored")
    else:
        logger.warning("no checkpoint found — evaluating random init")

    @jax.jit
    def forward(params, batch_stats, coord, feat, valid):
        return state.apply_fn(
            {"params": params, "batch_stats": batch_stats},
            coord,
            feat,
            valid,
            train=False,
        )

    def forward_fn(batch):
        import jax.numpy as jnp

        return forward(
            state.params,
            state.batch_stats,
            jnp.asarray(batch["coord"]),
            jnp.asarray(batch["feat"]),
            jnp.asarray(batch["valid"]),
        )

    if args.synthetic:
        # the val universe of SyntheticRooms (same seed convention as the
        # --synthetic trainer), evaluated RAW like real whole scenes
        from repsurf_tpu.data.synthetic_scene import SyntheticRooms

        synth = SyntheticRooms(
            "val",
            n_rooms=args.synthetic_rooms,
            raw_points=args.synthetic_raw,
            seed=args.synthetic_seed,
        )
        names = list(synth.rooms)

        def load_scene(si, name):
            data = synth._make(si)
            return data[:, :3], data[:, 3:6], data[:, 6]
    else:
        names = sorted(
            f[:-4]
            for f in os.listdir(args.data_dir)
            if f.endswith(".npy") and f"Area_{args.test_area}" in f
        )

        def load_scene(si, name):
            data = np.load(os.path.join(args.data_dir, name + ".npy"))
            return data[:, :3], data[:, 3:6], data[:, 6]

    logger.info(f"{len(names)} scenes")

    from repsurf_tpu.nn.metrics import intersection_and_union

    tot = np.zeros((3, cfg.num_class))
    for si, name in enumerate(names):
        coord, feat, label = load_scene(si, name)
        pred = predict_scene(
            forward_fn,
            coord,
            feat,
            cfg.num_class,
            voxel_size=cfg.voxel_size,
            voxel_max=cfg.voxel_max,
            batch_size=args.batch_size_test,
            data_norm=cfg.data_norm,
            seed=args.seed,
        )
        if args.filter:
            pred = median_filter(coord.astype(np.float32), pred, 32)
        inter, union, target = intersection_and_union(
            jax.numpy.asarray(pred),
            jax.numpy.asarray(label.astype(np.int64)),
            cfg.num_class,
            cfg.ignore_label,
        )
        tot += np.stack([np.asarray(inter), np.asarray(union), np.asarray(target)])
        logger.info(f"scene {si + 1}/{len(names)} {name}: {label.size} pts")
        if args.visual:
            visualize_scene(os.path.join(exp, "visual"), name, coord, pred, label)

    miou, macc, allacc = iou_from_counts(*map(jax.numpy.asarray, tot))
    logger.info(
        f"result: mIoU/mAcc/OA {float(miou) * 100:.2f}/"
        f"{float(macc) * 100:.2f}/{float(allacc) * 100:.2f}"
    )
    iou_class = tot[0] / (tot[1] + 1e-10)
    acc_class = tot[0] / (tot[2] + 1e-10)
    for i in range(cfg.num_class):
        logger.info(
            f"class {i} ({LABEL2CLASS[i]}): IoU/Acc "
            f"{iou_class[i] * 100:.2f}/{acc_class[i] * 100:.2f}"
        )
    return float(miou), float(macc), float(allacc)


if __name__ == "__main__":
    main()
