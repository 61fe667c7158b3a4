"""SPMD correctness on the virtual 8-device CPU mesh.

The authority test: a data+view-sharded training step must produce the SAME
loss and the SAME parameter update as the serial single-device step (the
view-axis psum decomposition of the cost volume is exact, and
correct_view_grads undoes the replication overcount on downstream params).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mvsformer_tpu.config import ModelConfig
from mvsformer_tpu.models.mvsformer import build_model
from mvsformer_tpu.ops import losses
from mvsformer_tpu.parallel import mesh as mesh_lib
from mvsformer_tpu.parallel import train_step as ts

from tests.test_model import make_batch, tiny_cfg


def make_full_batch(rng, B=2, V=5, H=64, W=64):
    imgs, projs, dv = make_batch(rng, B=B, V=V, H=H, W=W)
    gt, masks = {}, {}
    for i, scale in enumerate((8, 4, 2, 1)):
        h, w = H // scale, W // scale
        gt[f"stage{i+1}"] = jnp.asarray(rng.uniform(430, 890, (B, h, w)).astype(np.float32))
        masks[f"stage{i+1}"] = jnp.asarray((rng.uniform(size=(B, h, w)) > 0.1).astype(np.float32))
    return {
        "imgs": imgs,
        "proj_matrices": projs,
        "depth_values": dv,
        "depth_gt": gt,
        "mask": masks,
    }


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_view_sharded_step_matches_serial():
    rng = np.random.default_rng(0)
    # GroupNorm avoids BN batch-stat divergence between the serial run (stats
    # over the full batch) and the data-sharded run (per-shard stats);
    # droppath off so the random mask layout doesn't depend on sharding.
    cfg = tiny_cfg(ndepths=[4, 4, 2, 2], norm_type="GN")
    cfg.vit_args.drop_path_rate = 0.0
    batch = make_full_batch(rng, B=2, V=5, H=64, W=64)

    serial_model = build_model(cfg, dtype=jnp.float32)
    variables = jax.jit(lambda k: serial_model.init(
        k, batch["imgs"], batch["proj_matrices"],
        batch["depth_values"], training=False))(jax.random.PRNGKey(0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)

    # --- serial reference step with DDP loss semantics: per-data-shard masked
    # mean, then averaged (matches pmean over the "data" axis) ---
    def loss_fn(p):
        total = 0.0
        for b0 in range(2):
            sub = jax.tree.map(lambda x: x[b0:b0 + 1], batch)
            div = sub["depth_values"][:, 1] - sub["depth_values"][:, 0]
            out = serial_model.apply(
                {"params": p, "batch_stats": batch_stats},
                sub["imgs"], sub["proj_matrices"], sub["depth_values"],
                training=True, mutable=["batch_stats"],
            )[0]
            loss, _ = losses.total_loss(out, sub["depth_gt"], sub["mask"], div,
                                        depth_type=cfg.depth_type)
            total = total + loss / 2
        return total

    want_loss, want_grads = jax.jit(jax.value_and_grad(loss_fn))(params)

    # --- sharded step (data=2, view=2) ---
    mesh = mesh_lib.make_mesh(data=2, view=2, depth=1, devices=jax.devices()[:4])
    sharded_model = build_model(cfg, dtype=jnp.float32, axis_name="data",
                                view_axis="view")
    step = ts.make_train_step(sharded_model, cfg, mesh, tx, donate=False)
    split = ts.split_ref_src(batch)
    new_params, _, _, metrics = step(params, batch_stats, opt_state, split,
                                     jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(metrics["loss"]), float(want_loss),
                               rtol=2e-4, atol=2e-5)

    # The SGD update equals params - lr * grad: recover grads and compare.
    got_grads = jax.tree.map(lambda old, new: (old - new) / 1e-2, params, new_params)
    flat_want = jax.tree_util.tree_leaves_with_path(want_grads)
    got = dict(jax.tree_util.tree_leaves_with_path(got_grads))
    for path, w in flat_want:
        g = got[path]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-3, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_eval_step_runs_on_8dev_mesh():
    rng = np.random.default_rng(0)
    cfg = tiny_cfg(ndepths=[4, 4, 2, 2], norm_type="GN")
    batch = make_full_batch(rng, B=2, V=5, H=64, W=64)
    mesh = mesh_lib.make_mesh(data=2, view=4, depth=1)
    model = build_model(cfg, dtype=jnp.float32, axis_name="data", view_axis="view")
    # Init with a serial twin (identical param tree; psum axes are unbound
    # outside shard_map) on a tiny 2-view slice — params don't depend on V.
    serial = build_model(cfg, dtype=jnp.float32)
    variables = serial.init(
        jax.random.PRNGKey(0), batch["imgs"][:1, :2],
        jax.tree.map(lambda x: x[:1, :2], batch["proj_matrices"]),
        batch["depth_values"][:1], training=False)
    step = ts.make_eval_step(model, cfg, mesh)
    split = ts.split_ref_src(batch)
    split.pop("depth_gt")
    split.pop("mask")
    depth, conf = step(variables["params"], variables.get("batch_stats", {}), split)
    assert depth.shape == (2, 64, 64)
    assert conf.shape == (2, 64, 64)
    assert np.isfinite(np.asarray(depth)).all()


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_depth_slab_sharded_eval_matches_serial():
    """data=2 x view=2 x depth=2 mesh: GSPMD depth-slab cost-reg must produce
    the serial eval result (halo exchange correctness)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    cfg = tiny_cfg(ndepths=[8, 4, 4, 2], norm_type="GN")
    cfg.vit_args.drop_path_rate = 0.0
    batch = make_full_batch(rng, B=2, V=5, H=64, W=64)

    serial = build_model(cfg, dtype=jnp.float32)
    variables = serial.init(
        jax.random.PRNGKey(0), batch["imgs"][:1, :2],
        jax.tree.map(lambda x: x[:1, :2], batch["proj_matrices"]),
        batch["depth_values"][:1], training=False)

    want_depth = serial.apply(
        variables, batch["imgs"], batch["proj_matrices"], batch["depth_values"],
        training=False, tmp=[5.0, 5.0, 5.0, 1.0])["refined_depth"]

    mesh = mesh_lib.make_mesh(data=2, view=2, depth=2)
    model = build_model(
        cfg, dtype=jnp.float32, axis_name="data", view_axis="view",
        depth_sharding=NamedSharding(mesh, P(None, "depth")))
    step = ts.make_eval_step(model, cfg, mesh)
    split = ts.split_ref_src(batch)
    for k in ("depth_gt", "mask"):
        split.pop(k, None)
    got_depth, _ = step(variables["params"], variables.get("batch_stats", {}), split)

    np.testing.assert_allclose(np.asarray(got_depth), np.asarray(want_depth),
                               rtol=1e-4, atol=1e-3)
