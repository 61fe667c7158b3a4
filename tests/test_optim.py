"""Optimizer group construction tests (reference train.py:78-99 semantics)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mvsformer_tpu.config import OptimizerConfig
from mvsformer_tpu.train.optim import (
    frozen_mask,
    lr_scale_tree,
    make_optimizer,
    warmup_cosine_schedule,
    weight_decay_mask,
)


def fake_params():
    return {
        "vit": {
            "cls_token": jnp.zeros((1, 1, 8)),
            "pos_embed": jnp.zeros((1, 17, 8)),
            "patch_embed": {"kernel": jnp.zeros((4, 4, 3, 8)), "bias": jnp.zeros(8)},
            "block0": {"attn": {"qkv": {"kernel": jnp.zeros((8, 24)), "bias": jnp.zeros(24)}}},
            "block11": {"fc1": {"kernel": jnp.zeros((8, 32))}},
        },
        "encoder": {"conv00": {"kernel": jnp.zeros((7, 7, 3, 8)), "bias": jnp.zeros(8)}},
        "stage1": {"cost_reg": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 8, 16))}}},
    }


def test_twin_two_group_split():
    params = fake_params()
    cfg = OptimizerConfig(lr=1e-3, vit_lr=3e-5)
    scales = lr_scale_tree(params, cfg, "twin")
    assert scales["encoder"]["conv00"]["kernel"] == 1.0
    assert scales["stage1"]["cost_reg"]["conv1"]["kernel"] == 1.0
    np.testing.assert_allclose(scales["vit"]["block0"]["attn"]["qkv"]["kernel"], 3e-5 / 1e-3)


def test_dino_layer_decay():
    params = fake_params()
    cfg = OptimizerConfig(lr=1e-3, vit_lr=3e-5, layer_decay=0.75)
    scales = lr_scale_tree(params, cfg, "dino", vit_depth=12)
    ratio = 3e-5 / 1e-3
    # layer 0 (cls/pos/patch): decay^(13-0)
    np.testing.assert_allclose(scales["vit"]["cls_token"], ratio * 0.75 ** 13)
    # block0 -> layer 1: decay^12; block11 -> layer 12: decay^1
    np.testing.assert_allclose(
        scales["vit"]["block0"]["attn"]["qkv"]["kernel"], ratio * 0.75 ** 12)
    np.testing.assert_allclose(scales["vit"]["block11"]["fc1"]["kernel"], ratio * 0.75 ** 1)


def test_weight_decay_mask_rules():
    params = fake_params()
    m = weight_decay_mask(params, "twin")
    assert m["vit"]["block0"]["attn"]["qkv"]["kernel"] is True
    assert m["vit"]["block0"]["attn"]["qkv"]["bias"] is False  # 1D
    assert m["vit"]["pos_embed"] is False
    assert m["vit"]["cls_token"] is False
    assert m["encoder"]["conv00"]["kernel"] is False  # non-vit: wd 0


def test_frozen_backbone_updates_are_zero():
    params = fake_params()
    cfg = OptimizerConfig(warmup_steps=0)  # lr(0) > 0
    tx, _ = make_optimizer(params, cfg, "twin", total_steps=100, fix_backbone=True)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["vit"]["block0"]["attn"]["qkv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["encoder"]["conv00"]["kernel"]).max()) > 0.0


def test_warmup_cosine_shape():
    f = warmup_cosine_schedule(1.0, warmup_steps=10, total_steps=110, min_lr_frac=0.01)
    assert abs(float(f(0))) < 1e-6
    np.testing.assert_allclose(float(f(5)), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(f(10)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(f(110)), 0.01, atol=1e-5)
