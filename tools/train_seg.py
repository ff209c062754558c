#!/usr/bin/env python3
"""Segmentation training CLI — the TPU counterpart of segmentation/tool/train.py.

Single process drives all local devices: batches are sharded over the data
mesh inside the jitted step (no mp.spawn / DDP — SURVEY.md §2g).

Example (reference recipe):
  python tools/train_seg.py --data_dir ./data/S3DIS/trainval_fullarea \
      --model repsurf.repsurf_umb_ssg --batch_size 8 --epoch 100 \
      --freeze_epoch 10 --color_contrast --color_shift --color_jitter --hs_shift
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser("RepSurf-TPU segmentation")
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--log_root", type=str, default="./log")
    p.add_argument("--data_dir", type=str, default="./data/S3DIS/trainval_fullarea")
    p.add_argument("--dataset", type=str, default="S3DIS")
    p.add_argument("--model", default="repsurf.repsurf_umb_ssg")
    p.add_argument("--seed", type=int, default=2000)
    p.add_argument("--epoch", default=100, type=int)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--batch_size_val", type=int, default=8)
    p.add_argument("--optimizer", type=str, default="AdamW")
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--learning_rate", default=0.006, type=float)
    p.add_argument("--lr_decay", type=float, default=0.1)
    p.add_argument("--lr_decay_epochs", type=int, default=[60, 80], nargs="+")
    p.add_argument("--data_norm", type=str, default="mean")
    p.add_argument("--min_val", type=int, default=60)
    p.add_argument("--val_freq", type=int, default=1)
    p.add_argument("--test_area", type=int, default=5)
    p.add_argument("--voxel_max", type=int, default=80000)
    p.add_argument("--voxel_size", type=float, default=0.04)
    p.add_argument("--loop", type=int, default=30)
    p.add_argument("--aug_scale", action="store_true", default=False)
    p.add_argument("--aug_rotate", type=str, default=None)
    p.add_argument("--aug_jitter", action="store_true", default=False)
    p.add_argument("--aug_flip", action="store_true", default=False)
    p.add_argument("--aug_shift", action="store_true", default=False)
    p.add_argument("--color_contrast", action="store_true", default=False)
    p.add_argument("--color_shift", action="store_true", default=False)
    p.add_argument("--color_jitter", action="store_true", default=False)
    p.add_argument("--hs_shift", action="store_true", default=False)
    p.add_argument("--color_drop", action="store_true", default=False)
    p.add_argument("--group_size", type=int, default=8)
    p.add_argument("--return_polar", action="store_true", default=False)
    p.add_argument("--freeze_epoch", default=int(1e6), type=int)
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--bn", type=str, default="global",
                   choices=["global", "per_device", "sync"],
                   help="global = jit sharding (global-batch BN stats); "
                        "per_device = reference default (shard_map, "
                        "unsynchronized per-device BN); sync = --sync_bn "
                        "analog under shard_map")
    p.add_argument("--workers", type=int, default=0,
                   help="prefetch worker processes (0 = synchronous)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume model+optimizer+epoch from")
    p.add_argument("--pretrain", type=str, default=None,
                   help="checkpoint dir to load weights only from")
    p.add_argument("--synthetic", action="store_true", default=False,
                   help="train on labeled synthetic rooms (no dataset needed)")
    p.add_argument("--synthetic_rooms", type=int, default=12)
    p.add_argument("--synthetic_raw", type=int, default=120000,
                   help="raw points per synthetic room (pre-voxelization)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from repsurf_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    from repsurf_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()  # the 80k train/eval steps compile once/host
    import jax.numpy as jnp
    import numpy as np

    from repsurf_tpu.config.presets import S3DIS_AUG_ARGS
    from repsurf_tpu.data.aug import coord_transform_from_flags, rgb_transform_from_flags
    from repsurf_tpu.data.s3dis import CLASS_WEIGHTS, S3DISDataset, pad_batch
    from repsurf_tpu.nn.metrics import iou_from_counts
    from repsurf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from repsurf_tpu.train.checkpoint import (
        BestCheckpointer,
        apply_train_state,
        train_state_dict,
    )
    from repsurf_tpu.train.train_seg import (
        SegConfig,
        create_state,
        eval_step,
        is_frozen,
        set_epoch_lr,
        train_step,
    )
    from repsurf_tpu.utils import ScalarWriter, StepTimer, get_logger, set_seed

    # per-dataset constants (reference tool/train.py:452-470)
    if args.dataset == "ScanNet":
        from repsurf_tpu.data import scannet

        ds_num_class = scannet.NUM_CLASS
        ds_ignore = scannet.IGNORE_LABEL
        if args.voxel_size == 0.04:
            args.voxel_size = scannet.VOXEL_SIZE
        if args.voxel_max == 80000:
            args.voxel_max = scannet.VOXEL_MAX
        if args.loop == 30:
            args.loop = scannet.LOOP
    else:
        ds_num_class, ds_ignore = 13, 255

    cfg = SegConfig(
        model=args.model,
        dataset=args.dataset,
        num_class=ds_num_class,
        ignore_label=ds_ignore,
        pred_ignore0=(args.dataset == "ScanNet"),
        test_area=args.test_area,
        batch_size=args.batch_size,
        batch_size_val=args.batch_size_val,
        epoch=args.epoch,
        optimizer=args.optimizer,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        momentum=args.momentum,
        lr_decay=args.lr_decay,
        lr_decay_epochs=tuple(args.lr_decay_epochs),
        min_val=args.min_val,
        val_freq=args.val_freq,
        freeze_epoch=args.freeze_epoch,
        seed=args.seed,
        voxel_size=args.voxel_size,
        voxel_max=args.voxel_max,
        data_norm=args.data_norm,
        loop=args.loop,
        group_size=args.group_size,
        return_polar=args.return_polar,
        aug_scale=args.aug_scale,
        aug_rotate=args.aug_rotate,
        aug_jitter=args.aug_jitter,
        aug_flip=args.aug_flip,
        aug_shift=args.aug_shift,
        color_contrast=args.color_contrast,
        color_shift=args.color_shift,
        color_jitter=args.color_jitter,
        hs_shift=args.hs_shift,
        color_drop=args.color_drop,
    )

    exp = os.path.join(args.log_root, args.dataset, args.log_dir or "default")
    logger = get_logger(os.path.join(exp, "logs"), "train_seg")
    writer = ScalarWriter(os.path.join(exp, "logs"))
    logger.info(cfg)

    root_key = set_seed(cfg.seed)
    mesh = make_mesh(args.n_devices)
    n_dev = len(mesh.devices.flatten())
    assert cfg.batch_size % n_dev == 0 or cfg.batch_size < n_dev, (
        f"batch {cfg.batch_size} not divisible over {n_dev} devices"
    )
    logger.info(f"devices: {n_dev}, mesh: {mesh}")

    coord_t = coord_transform_from_flags(cfg, S3DIS_AUG_ARGS)
    rgb_t = rgb_transform_from_flags(cfg)
    if args.synthetic:
        from repsurf_tpu.data.synthetic_scene import SyntheticRooms

        train_set = SyntheticRooms(
            "train",
            n_rooms=args.synthetic_rooms,
            raw_points=args.synthetic_raw,
            loop=cfg.loop,
            voxel_size=cfg.voxel_size,
            voxel_max=cfg.voxel_max,
            coord_transform=coord_t,
            rgb_transform=rgb_t,
            shuffle_index=True,
            seed=cfg.seed,
        )
        val_set = SyntheticRooms(
            "val",
            n_rooms=max(2, args.synthetic_rooms // 4),
            raw_points=args.synthetic_raw,
            loop=1,
            voxel_size=cfg.voxel_size,
            voxel_max=cfg.voxel_max,
            seed=cfg.seed,
        )
    elif args.dataset == "ScanNet":
        from repsurf_tpu.data.scannet import ScanNetDataset

        train_set = ScanNetDataset(
            args.data_dir,
            "train",
            loop=cfg.loop,
            voxel_size=cfg.voxel_size,
            voxel_max=cfg.voxel_max,
            coord_transform=coord_t,
            rgb_transform=rgb_t,
            shuffle_index=True,
        )
        val_set = ScanNetDataset(
            args.data_dir,
            "val",
            loop=cfg.loop,
            voxel_size=cfg.voxel_size,
            voxel_max=cfg.voxel_max,
        )
    else:
        train_set = S3DISDataset(
            args.data_dir,
            "train",
            test_area=cfg.test_area,
            loop=cfg.loop,
            voxel_size=cfg.voxel_size,
            voxel_max=cfg.voxel_max,
            coord_transform=coord_t,
            rgb_transform=rgb_t,
            shuffle_index=True,
        )
        val_set = S3DISDataset(
            args.data_dir,
            "val",
            test_area=cfg.test_area,
            loop=cfg.loop,
            voxel_size=cfg.voxel_size,
            voxel_max=cfg.voxel_max,
        )
    logger.info(f"train rooms={len(train_set.rooms)} val rooms={len(val_set.rooms)}")

    state = create_state(cfg, n_points=cfg.voxel_max, key=root_key)
    state = replicate(state, mesh)
    if args.dataset == "ScanNet":
        from repsurf_tpu.data.scannet import CLASS_WEIGHTS as SCANNET_W

        weights = SCANNET_W
    else:
        weights = CLASS_WEIGHTS[cfg.test_area]
    class_weight = replicate(jnp.asarray(weights, jnp.float32), mesh)
    ckpt = BestCheckpointer(os.path.join(exp, "checkpoints"))
    host_rng = np.random.RandomState(cfg.seed)
    best_iou, start_epoch = 0.0, 0

    if args.resume or args.pretrain:
        import orbax.checkpoint as ocp

        path = os.path.abspath(args.resume or args.pretrain)
        if os.path.basename(path) != "best":
            path = os.path.join(path, "best")
        restored = ocp.StandardCheckpointer().restore(
            path, target=jax.device_get(train_state_dict(state))
        )
        state, start_epoch, best_iou = apply_train_state(
            state, restored, weights_only=args.pretrain is not None
        )
        state = replicate(state, mesh)
        ckpt.best_metric = best_iou
        logger.info(f"restored from {path} (epoch {start_epoch}, best {best_iou:.4f})")

    sharded_step, stats_stacked, unstack = None, None, None
    if args.bn != "global":
        from repsurf_tpu.parallel.shard_step import (
            make_seg_train_step,
            stack_batch_stats,
            unstack_batch_stats,
        )

        bn_mode = "per_device" if args.bn == "per_device" else "sync"
        sharded_step = make_seg_train_step(cfg, mesh, bn=bn_mode)
        stats_stacked = stack_batch_stats(state.batch_stats, n_dev)
        unstack = unstack_batch_stats
        logger.info(f"shard_map training step, bn={bn_mode}")

    def batches(ds, bs, shuffle):
        order = np.arange(len(ds))
        if shuffle:
            host_rng.shuffle(order)
        for s in range(0, len(order) - bs + 1, bs):
            samples = [ds.get(i, rng=host_rng) for i in order[s : s + bs]]
            yield pad_batch(samples, cfg.voxel_max, cfg.ignore_label)

    train_loader = None
    if args.workers > 0:
        from repsurf_tpu.runtime import PrefetchLoader

        def make_train_batch(indices, seed):
            rng = np.random.RandomState(seed)
            samples = [train_set.get(int(i), rng=rng) for i in indices]
            return pad_batch(samples, cfg.voxel_max, cfg.ignore_label)

        train_loader = PrefetchLoader(
            make_train_batch,
            n_items=len(train_set),
            batch_size=cfg.batch_size,
            n_workers=args.workers,
            seed=cfg.seed,
            name="s3dis_train",
        )

    for epoch in range(start_epoch, cfg.epoch):
        state = set_epoch_lr(state, cfg, epoch)
        freeze = is_frozen(cfg, epoch)
        timer = StepTimer()
        tot = np.zeros((3, cfg.num_class))
        losses = []
        epoch_batches = (
            train_loader.epoch(epoch)
            if train_loader is not None
            else batches(train_set, cfg.batch_size, True)
        )
        for i, batch in enumerate(epoch_batches):
            timer.data_loaded()
            batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
            key = jax.random.fold_in(jax.random.fold_in(root_key, epoch), i)
            if sharded_step is not None:
                params, opt_state, stats_stacked, loss, (inter, union, target) = (
                    sharded_step(
                        state.params, state.opt_state, stats_stacked,
                        batch, class_weight, key, freeze=freeze,
                    )
                )
                state = state.replace(
                    step=state.step + 1, params=params, opt_state=opt_state
                )
            else:
                state, loss, (inter, union, target) = train_step(
                    state, batch, class_weight, key, cfg, freeze=freeze
                )
            losses.append(float(loss))
            tot += np.stack(
                [np.asarray(inter), np.asarray(union), np.asarray(target)]
            )
            timer.step_done()
            if (i + 1) % 50 == 0:
                logger.info(
                    f"epoch {epoch + 1} [{i + 1}] loss {np.mean(losses):.4f} "
                    f"batch {timer.batch.avg:.3f}s"
                )
        miou, macc, allacc = iou_from_counts(*map(jnp.asarray, tot))
        logger.info(
            f"train epoch {epoch + 1}: mIoU/mAcc/OA "
            f"{float(miou) * 100:.2f}/{float(macc) * 100:.2f}/{float(allacc) * 100:.2f}"
        )
        writer.add_scalar("loss_train", float(np.mean(losses)), epoch + 1)
        writer.add_scalar("mIoU_train", float(miou), epoch + 1)
        writer.add_scalar("mAcc_train", float(macc), epoch + 1)
        writer.add_scalar("allAcc_train", float(allacc), epoch + 1)

        if sharded_step is not None:
            # rank-0 BN buffers back into the state for eval/checkpointing
            # (the torch convention: rank 0's running stats get saved)
            state = state.replace(batch_stats=unstack(stats_stacked, 0))
        if epoch + 1 > cfg.min_val and (epoch + 1) % cfg.val_freq == 0:
            tot = np.zeros((3, cfg.num_class))
            vlosses = []
            for batch in batches(val_set, cfg.batch_size_val, False):
                batch = shard_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()}, mesh
                )
                loss, _, (inter, union, target) = eval_step(
                    state, batch, class_weight, cfg
                )
                vlosses.append(float(loss))
                tot += np.stack(
                    [np.asarray(inter), np.asarray(union), np.asarray(target)]
                )
            miou, macc, allacc = iou_from_counts(*map(jnp.asarray, tot))
            logger.info(
                f"val epoch {epoch + 1}: mIoU/mAcc/OA "
                f"{float(miou) * 100:.2f}/{float(macc) * 100:.2f}/"
                f"{float(allacc) * 100:.2f} loss {np.mean(vlosses):.4f}"
            )
            iou_class = tot[0] / (tot[1] + 1e-10)
            acc_class = tot[0] / (tot[2] + 1e-10)
            for ci in range(cfg.num_class):
                logger.info(
                    f"class_{ci}: IoU/Acc {iou_class[ci] * 100:.2f}/"
                    f"{acc_class[ci] * 100:.2f}"
                )
                writer.add_scalar(f"class_{ci}_val_iou", iou_class[ci], epoch + 1)
            writer.add_scalar("loss_val", float(np.mean(vlosses)), epoch + 1)
            writer.add_scalar("mIoU_val", float(miou), epoch + 1)
            writer.add_scalar("mAcc_val", float(macc), epoch + 1)
            writer.add_scalar("allAcc_val", float(allacc), epoch + 1)
            if float(miou) > best_iou:
                best_iou = float(miou)
                ckpt.maybe_save(
                    best_iou, epoch + 1, train_state_dict(state, epoch + 1, best_iou)
                )
                logger.info(f"best mIoU -> {best_iou * 100:.2f}")

    if train_loader is not None:
        train_loader.close()
    writer.close()
    logger.info(f"done; best mIoU {best_iou * 100:.2f}")
    return best_iou


if __name__ == "__main__":
    main()
