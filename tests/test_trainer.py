"""Trainer integration test: synthetic scan -> one epoch -> val -> checkpoint."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsformer_tpu.config import Config, ModelConfig
from mvsformer_tpu.data.dtu import DTUMVSDataset
from mvsformer_tpu.data.loader import MVSLoader
from mvsformer_tpu.models.mvsformer import build_model
from mvsformer_tpu.parallel import mesh as mesh_lib
from mvsformer_tpu.train.trainer import Trainer

from tests.test_data import make_dtu_tree


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_train_one_epoch_and_checkpoint(tmp_path):
    root = make_dtu_tree(str(tmp_path / "dtu"), H=240, W=320)

    cfg = Config()
    cfg.name = "tiny-test"
    cfg.arch = ModelConfig(ndepths=[4, 4, 2, 2], depth_type="ce",
                           inverse_depth=True, norm_type="GN")
    cfg.arch.vit_args.drop_path_rate = 0.0
    cfg.trainer.epochs = 1
    cfg.trainer.save_dir = str(tmp_path / "saved")
    cfg.trainer.logging_every = 1
    cfg.data.multi_scale_args.scale_batch_map = {"64": 2}
    cfg.optimizer.warmup_steps = 2

    ms_args = {"scales": [[64, 64]], "resize_range": [1.0, 1.1],
               "scale_batch_map": {"64": 2}}
    train_ds = DTUMVSDataset(
        root, ["scan1"], "train", nviews=3, ndepths=16, crop=True,
        multi_scale=True, multi_scale_args=ms_args, batch_size=2)
    train_ds.BASE_H, train_ds.BASE_W = 240, 320
    val_ds = DTUMVSDataset(
        root, ["scan1"], "val", nviews=3, ndepths=16,
        multi_scale=False, height=64, width=64, resize_scale=0.45)
    val_ds.BASE_H, val_ds.BASE_W = 240, 320

    # Keep it small: 2 train batches, 2 val samples.
    train_ds.metas = train_ds.metas[:4]
    val_ds.metas = val_ds.metas[:2]

    train_loader = MVSLoader(train_ds, batch_size=2, num_workers=2, seed=0)
    val_loader = MVSLoader(val_ds, batch_size=2, shuffle=False, num_workers=2,
                           drop_last=False)
    val_loader.set_epoch(0)

    mesh = mesh_lib.make_mesh(data=2, view=1, depth=1, devices=jax.devices()[:2])
    model = build_model(cfg.arch, dtype=jnp.float32, axis_name="data",
                        view_axis="view")

    trainer = Trainer(cfg, model, mesh, train_loader, val_loader)
    train_loader.set_epoch(0)
    first = next(iter(train_loader))
    trainer.init_state(first)

    history = trainer.train()
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    assert "val_mean_error" in history[0]
    assert 0.0 <= history[0]["val_mean_error"] <= 1.0

    # best + last checkpoints exist and restore
    assert trainer.ckpt.has("model_best")
    assert trainer.ckpt.has("model_last")
    old = float(jax.tree.leaves(trainer.params)[0].sum())
    meta = trainer.restore("model_best")
    assert meta["epoch"] == 1
    new = float(jax.tree.leaves(trainer.params)[0].sum())
    assert np.isfinite(new)
