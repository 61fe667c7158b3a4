"""Inference + fusion CLI (two-phase test pipeline).

Functional spec: /root/reference/test.py — phase 1 `save_depth` dumps per-view
depth/confidence/cams/images; phase 2 fuses them into per-scan point clouds
with `pcd` (static) or `dpcd` (dynamic) consistency. The reference's third
backend, the external fusibile CUDA binary (`gipuma`), is covered by the
device-side `pcd` path (same consistency math, misc/gipuma.py:192-213) — pass
`--filter_method gipuma` to run it with fusibile-style thresholds.

Usage:
  python test.py --dataset dtu --testpath /path/dtu_test --testlist lists... \
      --ckpt_dir saved/models/MVSFormer-TPU --outdir outputs \
      --max_h 1152 --max_w 1536 --ndepths 192 --filter_method pcd
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="TPU-native MVSFormer testing")
    parser.add_argument("--dataset", default="dtu", choices=["dtu", "tt"])
    parser.add_argument("--testpath", required=True)
    parser.add_argument("--testlist", default=None,
                        help="scan list file; default = builtin benchmark list")
    parser.add_argument("--ckpt_dir", required=True,
                        help="run dir containing model_best + config.json")
    parser.add_argument("--which_ckpt", default="model_best")
    parser.add_argument("--torch_ckpt", default=None,
                        help="run a reference torch MVSFormer checkpoint "
                             "(.pth) directly: converted in-memory via "
                             "convert_full_twin instead of restoring an "
                             "orbax checkpoint")
    parser.add_argument("--outdir", required=True)
    parser.add_argument("--num_view", type=int, default=5,
                        help="views per reference (T&T benchmarks use 10-20)")
    parser.add_argument("--ndepths", type=int, default=192)
    parser.add_argument("--interval_scale", default="1.06",
                        help="depth interval scale: a float, or per-scene "
                             "'Scene1:1.0,Scene2:1.2' pairs (T&T)")
    parser.add_argument("--use_short_range", action="store_true",
                        help="read T&T short_range_cameras/cams_<scan> "
                             "(general_eval.py:168-169)")
    parser.add_argument("--max_h", type=int, default=1152)
    parser.add_argument("--max_w", type=int, default=1536)
    parser.add_argument("--tmps", default="5.0,5.0,5.0,1.0")
    parser.add_argument("--filter_method", default="pcd",
                        choices=["pcd", "dpcd", "gipuma"])
    parser.add_argument("--prob_threshold", default="0.5")
    parser.add_argument("--thres_view", type=int, default=5)
    parser.add_argument("--thres_disp", type=float, default=1.0)
    parser.add_argument("--dist_base", type=float, default=4.0)
    parser.add_argument("--rel_diff_base", type=float, default=1300.0)
    parser.add_argument("--disp_threshold", type=float, default=0.1,
                        help="gipuma-compat disparity threshold")
    parser.add_argument("--num_consistent", type=int, default=2,
                        help="gipuma-compat consistent-view count")
    parser.add_argument("--fusion_src_views", type=int, default=10)
    parser.add_argument("--combine_conf", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="save the stage-averaged confidence map; "
                             "--no-combine_conf saves the stacked per-stage "
                             "maps instead (test.py:280-293), consumed by "
                             "fusion with per-stage prob thresholds")
    parser.add_argument("--skip_depth", action="store_true",
                        help="fusion only (phase-1 outputs already exist)")
    parser.add_argument("--skip_fusion", action="store_true")
    parser.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. 'cpu' for smoke runs)")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="reference views per inference batch (rounded up "
                             "to --data_parallel)")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard the reference-view batch over this many "
                             "devices")
    parser.add_argument("--view_parallel", type=int, default=1,
                        help="shard source views over this many devices "
                             "(cost-volume psum)")
    parser.add_argument("--depth_parallel", type=int, default=1,
                        help="GSPMD depth-hypothesis-slab sharding of the "
                             "cost volumes over this many devices")
    parser.add_argument("--eval_view_chunk", type=int, default=0,
                        help=">0: backbone processes views in chunks of this "
                             "many at eval (HBM valve for large shapes / many "
                             "T&T views)")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mvsformer_tpu.config import load_config
    from mvsformer_tpu.data import scan_lists
    from mvsformer_tpu.fuse import fuse_scan
    from mvsformer_tpu.infer import save_depth
    from mvsformer_tpu.models.mvsformer import build_model
    from mvsformer_tpu.train.checkpoint import CheckpointManager

    if args.testlist:
        with open(args.testlist) as f:
            testlist = [line.strip() for line in f if line.strip()]
    elif args.dataset == "dtu":
        testlist = scan_lists.DTU_TEST
    else:
        testlist = scan_lists.TT_INTERMEDIATE

    os.makedirs(args.outdir, exist_ok=True)

    if not args.skip_depth:
        cfg = load_config(os.path.join(args.ckpt_dir, "config.json"))
        if args.eval_view_chunk:
            cfg.arch.eval_view_chunk = args.eval_view_chunk
        dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

        # Multi-chip inference: reference-view batch sharded over "data",
        # source views over "view" (StageNet psum completes the partial cost
        # volumes) — multi-chip serving the single-GPU reference lacks.
        mesh = None
        depth_sharding = None
        if args.data_parallel * args.view_parallel * args.depth_parallel > 1:
            from mvsformer_tpu.parallel import mesh as mesh_lib

            mesh = mesh_lib.make_mesh(data=args.data_parallel,
                                      view=args.view_parallel,
                                      depth=args.depth_parallel)
            if (args.num_view - 1) % args.view_parallel != 0:
                raise SystemExit(
                    f"--num_view {args.num_view} needs num_view-1 divisible "
                    f"by --view_parallel {args.view_parallel}")
            if args.batch_size % args.data_parallel != 0:
                args.batch_size = args.data_parallel
            if args.depth_parallel > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                depth_sharding = NamedSharding(mesh, P(None, "depth"))
        model = build_model(
            cfg.arch, dtype=dtype,
            view_axis="view" if args.view_parallel > 1 else None,
            depth_sharding=depth_sharding)

        # Restore params from the checkpoint (template from a tiny init).
        # The init uses a SERIAL twin — a view-axis model has unbound psum
        # axes outside shard_map; the param tree is identical.
        import numpy as np

        init_model = (build_model(cfg.arch, dtype=dtype)
                      if args.view_parallel > 1 or depth_sharding is not None
                      else model)
        dummy_imgs = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
        dummy_projs = {f"stage{i}": jnp.zeros((1, 2, 2, 4, 4), jnp.float32)
                       for i in range(1, 5)}
        dummy_projs = jax.tree.map(
            lambda x: x.at[..., 0, :, :].set(jnp.eye(4)).at[..., 1, :, :].set(jnp.eye(4)),
            dummy_projs)
        dummy_dv = jnp.asarray(np.linspace(400, 900, 48, dtype=np.float32)[None])
        variables = jax.jit(
            lambda k: init_model.init(k, dummy_imgs, dummy_projs, dummy_dv,
                                      training=False)
        )(jax.random.PRNGKey(0))

        if args.torch_ckpt:
            from mvsformer_tpu.utils.convert_weights import load_reference_checkpoint

            p, bs = load_reference_checkpoint(
                args.torch_ckpt, ndepths=tuple(cfg.arch.ndepths),
                model_th=cfg.arch.model_th)
            state = {"params": jax.tree.map(jnp.asarray, p),
                     "batch_stats": jax.tree.map(jnp.asarray, bs)}
        else:
            ckpt = CheckpointManager(args.ckpt_dir)
            state, _ = ckpt.restore(args.which_ckpt, {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            })
        tmps = [float(t) for t in args.tmps.split(",")]
        if ":" in args.interval_scale:
            interval_scale = {
                k: float(v) for k, v in
                (pair.split(":") for pair in args.interval_scale.split(","))}
        else:
            interval_scale = float(args.interval_scale)
        save_depth(model, state["params"], state["batch_stats"], testlist,
                   args.testpath, args.outdir, num_view=args.num_view,
                   ndepths=args.ndepths, interval_scale=interval_scale,
                   max_h=args.max_h, max_w=args.max_w, tmps=tmps,
                   dataset=args.dataset, batch_size=args.batch_size,
                   combine_conf=args.combine_conf,
                   use_short_range=args.use_short_range, mesh=mesh)

    if not args.skip_fusion:
        prob_threshold = [float(p) for p in args.prob_threshold.split(",")]
        for scan in testlist:
            pair_folder = os.path.join(args.testpath, scan)
            scan_folder = os.path.join(args.outdir, scan)
            ply = os.path.join(args.outdir, f"{scan}.ply")
            if args.filter_method == "gipuma":
                # fusibile-equivalent: disparity-space consistency with the
                # same --disp_thresh / --num_consistent semantics
                fuse_scan(pair_folder, scan_folder, ply, method="gipuma",
                          prob_threshold=prob_threshold,
                          disp_thresh=args.disp_threshold,
                          num_consistent=args.num_consistent,
                          n_src_views=args.fusion_src_views)
            elif args.filter_method == "pcd":
                fuse_scan(pair_folder, scan_folder, ply, method="pcd",
                          prob_threshold=prob_threshold,
                          thres_view=args.thres_view,
                          dist_thresh=args.thres_disp,
                          n_src_views=args.fusion_src_views)
            else:
                fuse_scan(pair_folder, scan_folder, ply, method="dpcd",
                          prob_threshold=prob_threshold,
                          dist_base=args.dist_base,
                          rel_diff_base=args.rel_diff_base,
                          n_src_views=args.fusion_src_views)


if __name__ == "__main__":
    main()
