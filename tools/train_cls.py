#!/usr/bin/env python3
"""Classification training CLI — the TPU counterpart of
classification/tool/train_cls_scanobjectnn.py.

Example (reference recipe):
  python tools/train_cls.py --data_dir ./data/ScanObjectNN \
      --model repsurf.repsurf_ssg_umb --batch_size 64 --epoch 250 \
      --group_size 8 --umb_pool sum --num_point 1024
Use --synthetic to smoke-run without the dataset.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser("RepSurf-TPU classification")
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--log_root", type=str, default="./log")
    p.add_argument("--model", default="repsurf.repsurf_ssg_umb")
    p.add_argument("--seed", type=int, default=2800)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--optimizer", type=str, default="Adam")
    p.add_argument("--epoch", default=250, type=int)
    p.add_argument("--learning_rate", default=0.001, type=float)
    p.add_argument("--decay_rate", type=float, default=1e-4)
    p.add_argument("--decay_step", default=20, type=int)
    p.add_argument("--init", type=str, default=None)
    p.add_argument("--min_val", type=int, default=100)
    p.add_argument("--aug_scale", action="store_true", default=False)
    p.add_argument("--aug_shift", action="store_true", default=False)
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--return_dist", action="store_true", default=True)
    p.add_argument("--return_center", action="store_true", default=True)
    p.add_argument("--return_polar", action="store_true", default=True)
    p.add_argument("--group_size", type=int, default=8)
    p.add_argument("--umb_pool", type=str, default="sum")
    p.add_argument("--synthetic", action="store_true", default=False,
                   help="train on synthetic clouds (no dataset needed)")
    p.add_argument("--n_devices", type=int, default=None,
                   help="devices for --dp_mode shard_map (default: all)")
    p.add_argument("--dp_mode", type=str, default="single",
                   choices=["single", "shard_map"],
                   help="shard_map = the reference nn.DataParallel analog: "
                        "per-replica BN, averaged gradients")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from repsurf_tpu.utils.platform import honor_platform_env

    honor_platform_env()

    from repsurf_tpu.data.scanobjectnn import ScanObjectNNDataset, SyntheticClouds
    from repsurf_tpu.train.checkpoint import (
        BestCheckpointer,
        apply_train_state,
        train_state_dict,
    )
    from repsurf_tpu.train.train_cls import (
        ClsConfig,
        create_state,
        evaluate,
        train_epoch,
    )
    from repsurf_tpu.utils import ScalarWriter, get_logger, set_seed

    cfg = ClsConfig(
        model=args.model,
        batch_size=args.batch_size,
        epoch=args.epoch,
        optimizer=args.optimizer,
        learning_rate=args.learning_rate,
        decay_rate=args.decay_rate,
        decay_step=args.decay_step,
        min_val=args.min_val,
        seed=args.seed,
        aug_scale=args.aug_scale,
        aug_shift=args.aug_shift,
        num_point=args.num_point,
        return_dist=args.return_dist,
        return_center=args.return_center,
        return_polar=args.return_polar,
        group_size=args.group_size,
        umb_pool=args.umb_pool,
        init_type=args.init,
    )

    log_dir = os.path.join(
        args.log_root, "ScanObjectNN", args.log_dir or "default", "logs"
    )
    ckpt_dir = os.path.join(
        args.log_root, "ScanObjectNN", args.log_dir or "default", "checkpoints"
    )
    logger = get_logger(log_dir, "train_cls")
    writer = ScalarWriter(log_dir)
    logger.info(cfg)

    import numpy as np

    root_key = set_seed(cfg.seed)
    if args.synthetic:
        train_set = SyntheticClouds(n_samples=512, seed=0)
        test_set = SyntheticClouds(n_samples=128, seed=1)
    else:
        data_path = os.path.join(args.data_dir, "ScanObjectNN")
        train_set = ScanObjectNNDataset(data_path, split="training")
        test_set = ScanObjectNNDataset(data_path, split="test")
    logger.info(f"train={len(train_set)} test={len(test_set)}")

    state = create_state(cfg, key=root_key)
    ckpt = BestCheckpointer(ckpt_dir)
    host_rng = np.random.RandomState(cfg.seed)

    # silent auto-resume from the best checkpoint, mirroring the reference's
    # bare try/except restore (train_cls_scanobjectnn.py:166-172)
    start_epoch, best_sing, best_vote = 0, 0.0, 0.0
    if ckpt.exists():
        try:
            restored = ckpt.restore(train_state_dict(state))
            state, start_epoch, best_vote = apply_train_state(state, restored)
            ckpt.best_metric = best_vote
            logger.info(f"resumed from epoch {start_epoch} (vote {best_vote:.4f})")
        except Exception as e:  # fresh run on incompatible checkpoints
            logger.info(f"no usable checkpoint ({e}); training from scratch")

    sharded = None
    if args.dp_mode == "shard_map":
        from repsurf_tpu.parallel.mesh import make_mesh
        from repsurf_tpu.parallel.shard_step import (
            make_cls_train_step,
            stack_batch_stats,
            unstack_batch_stats,
        )

        mesh = make_mesh(args.n_devices)
        n_dev = int(mesh.devices.size)
        assert cfg.batch_size % n_dev == 0, (
            f"batch {cfg.batch_size} not divisible over {n_dev} devices"
        )
        logger.info(f"shard_map DataParallel over {n_dev} devices")
        sharded = (
            make_cls_train_step(cfg, mesh),
            stack_batch_stats(state.batch_stats, n_dev),
            unstack_batch_stats,
        )

    for epoch in range(start_epoch, cfg.epoch):
        key = jax.random.fold_in(root_key, epoch)
        if sharded is not None:
            from repsurf_tpu.train.train_cls import train_epoch_sharded

            step, stats_stacked, unstack = sharded
            params, opt_state, stats_stacked, loss, acc = train_epoch_sharded(
                step, state.params, state.opt_state, stats_stacked,
                train_set, cfg, epoch, key, rng=host_rng,
            )
            sharded = (step, stats_stacked, unstack)
            # rank-0 BN buffers back into the state for eval/checkpointing
            state = state.replace(
                params=params,
                opt_state=opt_state,
                batch_stats=unstack(stats_stacked, 0),
            )
        else:
            state, loss, acc = train_epoch(state, train_set, cfg, epoch, key, rng=host_rng)
        logger.info(
            f"epoch {epoch + 1}/{cfg.epoch} loss {loss:.4f} acc {acc * 100:.2f}"
        )
        writer.add_scalar("loss_train", loss, epoch + 1)
        writer.add_scalar("acc_train", acc, epoch + 1)
        if epoch >= cfg.min_val:
            sing, vote = evaluate(state, test_set, cfg, jax.random.fold_in(key, 999))
            best_sing = max(best_sing, sing)
            if vote >= best_vote:
                best_vote = vote
                ckpt.maybe_save(
                    vote, epoch + 1, train_state_dict(state, epoch + 1, vote)
                )
            logger.info(
                f"single {sing * 100:.2f} (best {best_sing * 100:.2f}) "
                f"vote {vote * 100:.2f} (best {best_vote * 100:.2f})"
            )
            writer.add_scalar("acc_single_val", sing, epoch + 1)
            writer.add_scalar("acc_vote_val", vote, epoch + 1)
    writer.close()
    logger.info("done")


if __name__ == "__main__":
    main()
