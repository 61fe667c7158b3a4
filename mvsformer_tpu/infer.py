"""Phase-1 inference: predict per-reference-view depth + confidence and dump
artifacts for fusion.

Functional spec: /root/reference/test.py:171-329 (save_depth) — eval loop over
a scan list writing `depth_est/*.pfm`, `confidence/*.npy` (combined
stage-averaged + stacked per-stage), `cams/*_cam.txt`, `images/*.jpg` per
reference view, with per-stage temperatures and (for DTU) depth metrics
accumulated into depth_metric.txt.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from mvsformer_tpu.data.eval_dataset import MVSEvalDataset
from mvsformer_tpu.data.loader import MVSLoader
from mvsformer_tpu.utils import metrics as metric_lib
from mvsformer_tpu.utils.cams import CameraParams, write_cam_file
from mvsformer_tpu.utils.pfm import save_pfm


def make_infer_fn(model, tmps=(5.0, 5.0, 5.0, 1.0), want_stage_confs=True,
                  mesh=None, nstages=4):
    """Jitted eval forward returning depth, combined (+ per-stage) confidence.

    With want_stage_confs=False the stacked per-stage maps are not returned,
    letting XLA DCE their full-resolution upsampling/transfer (they are only
    consumed by --no-combine_conf fusion).

    With a mesh, the forward is a shard_map SPMD program: the batch of
    reference views is sharded over "data" and the source views over "view"
    (partial cost volumes completed by StageNet's psum) — multi-chip serving
    the reference (single-GPU test.py:232-249) has no analog of. The model
    must have been built with view_axis="view" when the mesh's view axis > 1.
    """
    if mesh is None:
        @jax.jit
        def fn(params, batch_stats, imgs, projs, depth_values):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, projs, depth_values, training=False, tmp=list(tmps))
            stage_confs = [out[f"stage{i}"]["photometric_confidence"]
                           for i in range(1, 5)] if want_stage_confs else []
            return (out["refined_depth"], out["photometric_confidence"],
                    stage_confs)

        return fn

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    stages = [f"stage{i+1}" for i in range(nstages)]

    def local_eval(params, batch_stats, batch):
        imgs = jnp.concatenate([batch["imgs_ref"], batch["imgs_src"]], axis=1)
        projs = {k: jnp.concatenate(
            [batch["proj_ref"][k], batch["proj_src"][k]], axis=1)
            for k in batch["proj_ref"]}
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, projs, batch["depth_values"], training=False,
            tmp=list(tmps))
        stage_confs = tuple(out[s]["photometric_confidence"]
                            for s in stages) if want_stage_confs else ()
        return (out["refined_depth"], out["photometric_confidence"],
                stage_confs)

    rep = P()
    batch_specs = {
        "imgs_ref": P("data"),
        "imgs_src": P("data", "view"),
        "proj_ref": {s: P("data") for s in stages},
        "proj_src": {s: P("data", "view") for s in stages},
        "depth_values": P("data"),
    }
    n_confs = nstages if want_stage_confs else 0
    sharded = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(rep, rep, batch_specs),
        out_specs=(P("data"), P("data"), (P("data"),) * n_confs),
        axis_names={"data", "view"},
        check_vma=False,
    )

    @jax.jit
    def fn(params, batch_stats, imgs, projs, depth_values):
        batch = {
            "imgs_ref": imgs[:, :1],
            "imgs_src": imgs[:, 1:],
            "proj_ref": {k: v[:, :1] for k, v in projs.items()},
            "proj_src": {k: v[:, 1:] for k, v in projs.items()},
            "depth_values": depth_values,
        }
        depth, conf, stage_confs = sharded(params, batch_stats, batch)
        return depth, conf, list(stage_confs)

    return fn


def save_depth(model, params, batch_stats, testlist, datapath, outdir,
               num_view=5, ndepths=192, interval_scale=1.06, max_h=1152,
               max_w=1536, tmps=(5.0, 5.0, 5.0, 1.0), dataset="dtu",
               batch_size=1, combine_conf=True, use_short_range=False,
               mesh=None, logger=print):
    """Run inference over every reference view of every scan in `testlist`.

    With a mesh, each batch of reference views is an SPMD forward over the
    ("data","view") axes (see make_infer_fn); trailing partial batches are
    padded to the data-axis multiple and the pad outputs dropped."""
    infer = make_infer_fn(model, tmps, want_stage_confs=not combine_conf,
                          mesh=mesh)
    n_data = mesh.shape.get("data", 1) if mesh is not None else 1
    if mesh is not None:
        # Checkpoint-restored arrays are committed to device 0; shard_map
        # needs them placed (replicated) over the whole mesh.
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        params, batch_stats = jax.tree.map(
            lambda x: jax.device_put(x, rep), (params, batch_stats))
    ds = MVSEvalDataset(datapath, testlist, nviews=num_view, ndepths=ndepths,
                        interval_scale=interval_scale, max_h=max_h, max_w=max_w,
                        dataset=dataset, use_short_range=use_short_range)
    loader = MVSLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False,
                       num_workers=4)
    loader.set_epoch(0)

    metric_sum = {}
    metric_count = 0
    n_batches = 0
    t_start = None

    def _process(batch, B, outputs):
        """Host-side half of one batch: force the (already dispatched) device
        outputs and write artifacts. Runs while the NEXT batch computes on
        device (double-buffered readback — jax dispatch is async, so the
        np.asarray here overlaps the next forward, and the PFM/JPEG writes
        overlap device compute instead of serializing with it)."""
        nonlocal metric_count
        depth_d, conf_d, stage_confs_d = outputs
        depth = np.asarray(depth_d)[:B]
        conf = np.asarray(conf_d)[:B]
        stage_confs = [np.asarray(c)[:B] for c in stage_confs_d]
        dv = batch["depth_values"]

        if "depth_gt" in batch:
            di = float(dv[0, 1] - dv[0, 0]) / 2.65
            gt = jnp.asarray(batch["depth_gt"][:B])
            mask = jnp.asarray(batch["mask"][:B]) > 0.5
            m = metric_lib.depth_metrics(jnp.asarray(depth), gt, mask, di)
            for k, v in m.items():
                metric_sum[k] = metric_sum.get(k, 0.0) + float(v)
            metric_count += 1

        _write_artifacts(batch, B, depth, conf, stage_confs)

    def _write_artifacts(batch, B, depth, conf, stage_confs):
        dv = batch["depth_values"]

        for b, filename in enumerate(batch["filename"]):
            depth_path = os.path.join(outdir, filename.format("depth_est", ".pfm"))
            conf_path = os.path.join(outdir, filename.format("confidence", ".npy"))
            cam_path = os.path.join(outdir, filename.format("cams", "_cam.txt"))
            img_path = os.path.join(outdir, filename.format("images", ".jpg"))
            for p in (depth_path, conf_path, cam_path, img_path):
                os.makedirs(os.path.dirname(p), exist_ok=True)

            save_pfm(depth_path, depth[b])
            if combine_conf:
                np.save(conf_path, conf[b])
            else:
                # stacked per-stage confidences upsampled to full res
                import cv2

                stack = [cv2.resize(c[b], (depth.shape[2], depth.shape[1]),
                                    interpolation=cv2.INTER_NEAREST)
                         for c in stage_confs]
                np.save(conf_path, np.stack(stack))

            ref = batch["proj_matrices"]["stage4"][b, 0]
            cam = CameraParams(
                extrinsic=np.asarray(ref[0]),
                intrinsic=np.asarray(ref[1, :3, :3]),
                depth_min=float(dv[b, 0]),
                depth_interval=float(dv[b, 1] - dv[b, 0]),
                num_depth=float(ndepths),
                depth_max=float(dv[b, -1]),
            )
            write_cam_file(cam_path, cam)

            import cv2

            from mvsformer_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

            img = np.asarray(batch["imgs"][b, 0]) * IMAGENET_STD + IMAGENET_MEAN
            img = np.clip(img * 255, 0, 255).astype(np.uint8)
            cv2.imwrite(img_path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    pending = None
    for batch in loader:
        B = batch["imgs"].shape[0]
        if B % n_data != 0:
            pad = n_data - B % n_data

            def _pad(x):
                if isinstance(x, np.ndarray) and x.ndim >= 1 and x.shape[0] == B:
                    return np.concatenate([x, np.repeat(x[-1:], pad, 0)], 0)
                return x

            batch = {k: jax.tree.map(_pad, v) if k != "filename" else v
                     for k, v in batch.items()}
        imgs = jnp.asarray(batch["imgs"])
        projs = {k: jnp.asarray(v) for k, v in batch["proj_matrices"].items()
                 if k in ("stage1", "stage2", "stage3", "stage4")}
        dv = jnp.asarray(batch["depth_values"])
        if t_start is None:
            t_start = time.perf_counter()
        outputs = infer(params, batch_stats, imgs, projs, dv)  # async dispatch
        if pending is not None:
            _process(*pending)
        pending = (batch, B, outputs)
        n_batches += 1
    if pending is not None:
        _process(*pending)

    total = time.perf_counter() - t_start if t_start is not None else 0.0
    logger(f"avg inference time: {total / max(n_batches, 1):.3f}s over "
           f"{n_batches} batches (pipelined readback)")
    if metric_count:
        metrics = {k: v / metric_count for k, v in metric_sum.items()}
        with open(os.path.join(outdir, "depth_metric.txt"), "w") as f:
            for k, v in metrics.items():
                f.write(f"{k}: {v}\n")
        logger(f"depth metrics: {metrics}")
        return metrics
    return None
