"""Training CLI.

Functional spec: /root/reference/train.py — config + CLI overrides, dataset /
loader / model / optimizer construction, distributed setup, Trainer launch.
TPU differences: no mp.spawn/NCCL — one process per host with
`jax.distributed.initialize` for multi-host and a ("data","view","depth")
mesh over all devices; bf16 needs no GradScaler.

Usage:
  python train.py --config configs/config_mvsformer.json \
      --data_path /path/to/DTU [--view_parallel 2] [--resume]
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="TPU-native MVSFormer training")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--vit_path", type=str, default=None,
                        help="pretrained Twins/DINO torch checkpoint "
                             "(overrides arch.vit_args.vit_path)")
    parser.add_argument("--finetune", type=str, default=None,
                        help="checkpoint dir of a previous run to finetune "
                             "from (reference train.py:106-131)")
    parser.add_argument("--finetune_name", type=str, default="model_best")
    parser.add_argument("--no_restore_opt", action="store_true",
                        help="finetune: do not restore optimizer moments")
    parser.add_argument("--keep_schedule", action="store_true",
                        help="finetune: fast-forward the LR schedule instead "
                             "of resetting it")
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--save_every_steps", type=int, default=None,
                        help="mid-epoch model_step checkpoint every N steps "
                             "(preemption recovery; --resume picks it up)")
    parser.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "fp32"])
    parser.add_argument("--data_parallel", type=int, default=-1,
                        help="size of the 'data' mesh axis (-1 = all devices "
                             "left over after view/depth); must divide the "
                             "per-host batch size")
    parser.add_argument("--view_parallel", type=int, default=1,
                        help="size of the 'view' mesh axis")
    parser.add_argument("--depth_parallel", type=int, default=1,
                        help="size of the 'depth' mesh axis (cost-volume slabs)")
    parser.add_argument("--multi_host", action="store_true",
                        help="call jax.distributed.initialize()")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. 'cpu' for smoke runs; "
                             "overrides any environment-registered backend)")
    parser.add_argument("--debug", action="store_true",
                        help="per-subtree gradient inf/nan scan + TB grad maxima")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of training steps "
                             "[profile_start, profile_start+profile_steps) "
                             "into this directory (xprof-viewable)")
    parser.add_argument("--profile_start", type=int, default=10)
    parser.add_argument("--profile_steps", type=int, default=5)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.multi_host:
        jax.distributed.initialize()

    import jax.numpy as jnp
    from tensorboardX import SummaryWriter

    from mvsformer_tpu.config import load_config, save_config
    from mvsformer_tpu.data.blended import BlendedMVSDataset
    from mvsformer_tpu.data.dtu import DTUMVSDataset
    from mvsformer_tpu.data.loader import MVSLoader
    from mvsformer_tpu.models.mvsformer import build_model
    from mvsformer_tpu.parallel import mesh as mesh_lib
    from mvsformer_tpu.train.trainer import Trainer

    overrides = {}
    if args.lr is not None:
        overrides["optimizer.lr"] = args.lr
    cfg = load_config(args.config, overrides)
    if args.data_path:
        cfg.data.datapath = args.data_path
    if args.vit_path is not None:
        cfg.arch.vit_args.vit_path = args.vit_path
    if args.save_every_steps is not None:
        cfg.trainer.save_every_steps = args.save_every_steps

    host_id = jax.process_index()
    num_hosts = jax.process_count()

    is_blended = cfg.data.type == "BlendedLoader"
    ds_cls = BlendedMVSDataset if is_blended else DTUMVSDataset
    dkw = dict(
        nviews=cfg.data.nviews, ndepths=cfg.data.num_depths,
        interval_scale=cfg.data.interval_scale, crop=cfg.data.crop,
        augment=cfg.data.augment, aug_args=vars(cfg.data.aug_args),
        height=cfg.data.height, width=cfg.data.width,
        multi_scale=cfg.data.multi_scale,
        multi_scale_args={
            "scales": cfg.data.multi_scale_args.scales,
            "resize_range": cfg.data.multi_scale_args.resize_range,
            "scale_batch_map": cfg.data.multi_scale_args.scale_batch_map,
        },
        resize_scale=cfg.data.resize_scale, consist_crop=cfg.data.consist_crop,
        seed=args.seed)
    train_ds = ds_cls(cfg.data.datapath, cfg.data.train_data_list, "train",
                      batch_size=cfg.data.batch_size // num_hosts, **dkw)
    val_ds = ds_cls(cfg.data.datapath, cfg.data.val_data_list, "val", **dkw)

    per_host_batch = max(1, cfg.data.batch_size // num_hosts)
    train_loader = MVSLoader(train_ds, per_host_batch, shuffle=cfg.data.shuffle,
                             num_workers=cfg.data.num_workers, seed=args.seed,
                             host_id=host_id, num_hosts=num_hosts)
    val_loader = MVSLoader(val_ds, per_host_batch, shuffle=False,
                           drop_last=False, num_workers=cfg.data.num_workers,
                           host_id=host_id, num_hosts=num_hosts)
    val_loader.set_epoch(0)

    mesh = mesh_lib.make_mesh(data=args.data_parallel, view=args.view_parallel,
                              depth=args.depth_parallel)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    depth_sharding = None
    if args.depth_parallel > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        depth_sharding = NamedSharding(mesh, P(None, "depth"))
    model = build_model(cfg.arch, dtype=dtype, axis_name="data",
                        view_axis="view" if args.view_parallel > 1 else None,
                        depth_sharding=depth_sharding)

    run_dir = os.path.join(cfg.trainer.save_dir, "models", cfg.name)
    os.makedirs(run_dir, exist_ok=True)
    writer = SummaryWriter(os.path.join(cfg.trainer.save_dir, "log", cfg.name)) \
        if host_id == 0 else None
    save_config(cfg, os.path.join(run_dir, "config.json"))

    from mvsformer_tpu.utils.logging import setup_logging

    logger = setup_logging(run_dir) if host_id == 0 else None
    trainer = Trainer(cfg, model, mesh, train_loader, val_loader, writer=writer,
                      logger=logger, is_blended=is_blended, debug=args.debug,
                      profile=(args.profile_dir, args.profile_start,
                               args.profile_steps) if args.profile_dir else None)
    train_loader.set_epoch(0)
    first = next(iter(train_loader))
    trainer.init_state(first)

    start_epoch, skip_batches = 1, 0
    if args.resume:
        info = trainer.resume_auto()
        if info:
            start_epoch = info["start_epoch"]
            skip_batches = info["skip_batches"]
    elif args.finetune:
        trainer.finetune(args.finetune, name=args.finetune_name,
                         restore_opt=not args.no_restore_opt,
                         reset_schedule=not args.keep_schedule)

    trainer.train(start_epoch, skip_batches)


if __name__ == "__main__":
    main()
