"""SPMD training/eval steps over the ("data","view","depth") mesh.

Replaces the reference's distributed layer (DDP grad all-reduce + SyncBN +
validation all_reduce, train.py:135-139 / mvsformer_trainer.py:202-212) with
shard_map + XLA collectives, and ADDS view-axis model parallelism the
reference does not have:

- batch is sharded over "data"; parameter gradients are pmean'ed over "data"
  (== DDP all-reduce).
- source views are sharded over "view": each device runs the backbone and the
  warp+correlation for `(V-1)/n_view` source views (plus the reference view,
  recomputed locally — cheaper than broadcasting feature maps), and the
  StageNet accumulators are completed with a psum over "view"
  (mvsformer_tpu/models/stagenet.py).

Gradient correction over "view" is a single pmean, and the reason is the
psum transpose rule: `jax.grad` of the per-device loss inside shard_map
differentiates sum_over_view_devices(local_loss) = n_view * L (every device
computes the identical loss from the psum'ed volume, and the cotangent of a
psum is a psum). Hence
- params upstream of the cost-volume psum (backbone/FPN/decoders/vis-CNN)
  come out as n_view x (their local per-view partial) — pmean over "view"
  reassembles the exact serial sum over views;
- params downstream of the psum (cost-reg U-Nets) come out as 1 x (the exact
  full grad), replicated — pmean is the identity on them.
`test_parallel.py` pins the sharded update against the serial gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from mvsformer_tpu.ops import losses as loss_lib

def correct_view_grads(grads, n_view: int, axis: str = "view"):
    """Exact view-axis gradient reassembly == pmean (see module docstring)."""
    del n_view
    return jax.lax.pmean(grads, axis)


def split_ref_src(batch: dict) -> dict:
    """Split per-view arrays into reference (view 0) and source (1:) parts so
    the source axis can be sharded over "view" while the reference stays
    replicated."""
    out = dict(batch)
    out["imgs_ref"] = batch["imgs"][:, :1]
    out["imgs_src"] = batch["imgs"][:, 1:]
    del out["imgs"]
    proj_ref, proj_src = {}, {}
    for k, v in batch["proj_matrices"].items():
        proj_ref[k] = v[:, :1]
        proj_src[k] = v[:, 1:]
    out["proj_ref"] = proj_ref
    out["proj_src"] = proj_src
    del out["proj_matrices"]
    return out


def make_train_step(model, cfg, mesh: Mesh, optimizer, donate: bool = True):
    """Build the jitted SPMD train step.

    The returned step takes (params, batch_stats, opt_state, batch, rng) and
    returns (params, batch_stats, opt_state, metrics). `batch` is the
    split_ref_src dict with leading batch axis shardable over "data" and the
    source-view axis shardable over "view".
    """
    n_view = mesh.shape["view"]
    n_data = mesh.shape["data"]
    axis_names = tuple(mesh.axis_names)

    def local_step(params, batch_stats, opt_state, batch, rng):
        imgs = jnp.concatenate([batch["imgs_ref"], batch["imgs_src"]], axis=1)
        projs = {
            k: jnp.concatenate([batch["proj_ref"][k], batch["proj_src"][k]], axis=1)
            for k in batch["proj_ref"]
        }
        depth_values = batch["depth_values"]
        depth_interval = depth_values[:, 1] - depth_values[:, 0]

        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs, projs, depth_values, training=True,
                mutable=["batch_stats"], rngs={"droppath": rng},
            )
            loss, loss_dict = loss_lib.total_loss(
                out, batch["depth_gt"], batch["mask"], depth_interval,
                depth_type=cfg.depth_type, focal=cfg.focal, gamma=cfg.gamma,
                inverse_depth=cfg.inverse_depth, mask_out_range=cfg.mask_out_range,
                stage_keys=tuple(f"stage{i+1}" for i in range(len(cfg.ndepths))),
            )
            return loss, (loss_dict, updates["batch_stats"])

        (loss, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        # view-axis: exact-sum correction; data-axis: mean (DDP semantics).
        grads = correct_view_grads(grads, n_view, "view")
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(jax.lax.pmean(loss, "view"), "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        if n_view > 1:
            new_stats = jax.lax.pmean(new_stats, "view")

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm}
        for k, v in loss_dict.items():
            metrics[f"loss_{k}"] = jax.lax.pmean(jax.lax.pmean(v, "view"), "data")
        return params, new_stats, opt_state, metrics

    # Shardings: params/opt_state replicated; batch: data axis over "data",
    # source-view axis over "view".
    rep = P()
    batch_specs = {
        "imgs_ref": P("data"),
        "imgs_src": P("data", "view"),
        "proj_ref": {f"stage{i+1}": P("data") for i in range(len(cfg.ndepths))},
        "proj_src": {f"stage{i+1}": P("data", "view") for i in range(len(cfg.ndepths))},
        "depth_values": P("data"),
        "depth_gt": {f"stage{i+1}": P("data") for i in range(len(cfg.ndepths))},
        "mask": {f"stage{i+1}": P("data") for i in range(len(cfg.ndepths))},
    }

    from jax import shard_map

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, rep, rep, batch_specs, rep),
        out_specs=(rep, rep, rep, rep),
        axis_names={"data", "view"},  # "depth" stays automatic (GSPMD slabs)
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2) if donate else ())


def make_grad_step(model, cfg, mesh: Mesh):
    """Jitted SPMD gradient step (no optimizer update) for micro-batch
    accumulation (the reference's resolution-dependent grad accumulation,
    mvsformer_trainer.py:87-137). Returns (grads, new_batch_stats, metrics)."""
    n_view = mesh.shape["view"]

    def local_grads(params, batch_stats, batch, rng):
        imgs = jnp.concatenate([batch["imgs_ref"], batch["imgs_src"]], axis=1)
        projs = {
            k: jnp.concatenate([batch["proj_ref"][k], batch["proj_src"][k]], axis=1)
            for k in batch["proj_ref"]
        }
        depth_values = batch["depth_values"]
        depth_interval = depth_values[:, 1] - depth_values[:, 0]

        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs, projs, depth_values, training=True,
                mutable=["batch_stats"], rngs={"droppath": rng},
            )
            loss, loss_dict = loss_lib.total_loss(
                out, batch["depth_gt"], batch["mask"], depth_interval,
                depth_type=cfg.depth_type, focal=cfg.focal, gamma=cfg.gamma,
                inverse_depth=cfg.inverse_depth, mask_out_range=cfg.mask_out_range,
                stage_keys=tuple(f"stage{i+1}" for i in range(len(cfg.ndepths))),
            )
            return loss, (loss_dict, updates["batch_stats"])

        (loss, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = correct_view_grads(grads, n_view, "view")
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(jax.lax.pmean(loss, "view"), "data")
        new_stats = jax.lax.pmean(new_stats, "data")
        if n_view > 1:
            new_stats = jax.lax.pmean(new_stats, "view")
        metrics = {"loss": loss}
        for k, v in loss_dict.items():
            metrics[f"loss_{k}"] = jax.lax.pmean(jax.lax.pmean(v, "view"), "data")
        return grads, new_stats, metrics

    rep = P()
    batch_specs = {
        "imgs_ref": P("data"),
        "imgs_src": P("data", "view"),
        "proj_ref": {f"stage{i+1}": P("data") for i in range(len(cfg.ndepths))},
        "proj_src": {f"stage{i+1}": P("data", "view") for i in range(len(cfg.ndepths))},
        "depth_values": P("data"),
        "depth_gt": {f"stage{i+1}": P("data") for i in range(len(cfg.ndepths))},
        "mask": {f"stage{i+1}": P("data") for i in range(len(cfg.ndepths))},
    }
    from jax import shard_map

    sharded = shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(rep, rep, batch_specs, rep),
        out_specs=(rep, rep, rep),
        axis_names={"data", "view"},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_apply_step(optimizer):
    """Jitted optimizer application for accumulated (averaged) grads."""

    @jax.jit
    def apply(params, opt_state, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, optax.global_norm(grads)

    return apply


def make_eval_step(model, cfg, mesh: Mesh, tmp=(5.0, 5.0, 5.0, 1.0)):
    """Jitted SPMD eval step -> (refined_depth, confidence) per sample."""
    axis_names = tuple(mesh.axis_names)

    def local_eval(params, batch_stats, batch):
        imgs = jnp.concatenate([batch["imgs_ref"], batch["imgs_src"]], axis=1)
        projs = {
            k: jnp.concatenate([batch["proj_ref"][k], batch["proj_src"][k]], axis=1)
            for k in batch["proj_ref"]
        }
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs, projs, batch["depth_values"], training=False, tmp=list(tmp),
        )
        return out["refined_depth"], out["photometric_confidence"]

    rep = P()
    batch_specs = {
        "imgs_ref": P("data"),
        "imgs_src": P("data", "view"),
        "proj_ref": {f"stage{i+1}": P("data") for i in range(len(cfg.ndepths))},
        "proj_src": {f"stage{i+1}": P("data", "view") for i in range(len(cfg.ndepths))},
        "depth_values": P("data"),
    }
    from jax import shard_map

    sharded = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(rep, rep, batch_specs),
        out_specs=(P("data"), P("data")),
        axis_names={"data", "view"},
        check_vma=False,
    )
    return jax.jit(sharded)
