"""End-to-end cascade model tests (tiny shapes, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsformer_tpu.config import ModelConfig
from mvsformer_tpu.models.mvsformer import build_model
from mvsformer_tpu.ops import losses


def tiny_cfg(**kw):
    base = dict(
        ndepths=[8, 4, 4, 2],
        depth_interals_ratio=[4.0, 2.67, 1.5, 1.0],
        feat_chs=[8, 16, 32, 64],
        base_ch=8,
        depth_type="ce",
        inverse_depth=True,
        fusion_type="cnn",
    )
    base.update(kw)
    return ModelConfig(**base)


def make_batch(rng, B=1, V=3, H=64, W=64, ndepth_full=48):
    imgs = jnp.asarray(rng.standard_normal((B, V, H, W, 3), dtype=np.float32))
    K = np.array([[80.0, 0, W / 4], [0, 80.0, H / 4], [0, 0, 1]], np.float32)
    projs = {}
    for s, scale in zip(range(1, 5), (1 / 8, 1 / 4, 1 / 2, 1.0)):
        cams = np.zeros((B, V, 2, 4, 4), np.float32)
        for v in range(V):
            ext = np.eye(4, dtype=np.float32)
            ext[0, 3] = v * 2.0  # translated source cameras
            cams[:, v, 0] = ext
            cams[:, v, 1, :3, :3] = K * scale
            cams[:, v, 1, 2, 2] = 1.0
            cams[:, v, 1, 3, 3] = 1.0
        projs[f"stage{s}"] = jnp.asarray(cams)
    dv = np.broadcast_to(
        np.linspace(425, 900, ndepth_full, dtype=np.float32)[None], (B, ndepth_full)
    ).copy()
    return imgs, projs, jnp.asarray(dv)


@pytest.fixture(scope="module")
def model_and_vars():
    rng = np.random.default_rng(0)
    cfg = tiny_cfg()
    model = build_model(cfg, dtype=jnp.float32)
    imgs, projs, dv = make_batch(rng)
    variables = jax.jit(
        lambda k: model.init(k, imgs, projs, dv, training=False)
    )(jax.random.PRNGKey(0))
    return cfg, model, variables, (imgs, projs, dv)


@pytest.fixture(scope="module")
def eval_out(model_and_vars):
    """ONE jitted eval forward shared by the read-only assertions below
    (an eager apply was ~90s of the fast tier on CPU)."""
    cfg, model, variables, (imgs, projs, dv) = model_and_vars
    return jax.jit(
        lambda v: model.apply(v, imgs, projs, dv, training=False,
                              tmp=[5.0, 5.0, 5.0, 1.0])
    )(variables)


def test_eval_forward_shapes(model_and_vars, eval_out):
    cfg, model, variables, (imgs, projs, dv) = model_and_vars
    out = eval_out
    B, V, H, W, _ = imgs.shape
    for i, scale in enumerate((8, 4, 2, 1)):
        st = out[f"stage{i + 1}"]
        assert st["depth"].shape == (B, H // scale, W // scale)
        assert st["prob_volume"].shape == (B, cfg.ndepths[i], H // scale, W // scale)
        assert st["photometric_confidence"].shape == (B, H // scale, W // scale)
        assert "sim_depth" in st
        assert np.isfinite(np.asarray(st["depth"])).all()
    assert out["refined_depth"].shape == (B, H, W)
    assert out["photometric_confidence"].shape == (B, H, W)
    conf = np.asarray(out["photometric_confidence"])
    assert (conf >= 0).all() and (conf <= 1 + 1e-5).all()


def test_depths_within_hypothesis_range(eval_out):
    out = eval_out
    for i in range(4):
        st = out[f"stage{i + 1}"]
        dvs = np.asarray(st["depth_values"])
        d = np.asarray(st["depth"])
        assert (d >= dvs.min() - 1e-3).all() and (d <= dvs.max() + 1e-3).all()


@pytest.mark.slow
def test_train_step_loss_and_grads(model_and_vars):
    cfg, model, variables, (imgs, projs, dv) = model_and_vars
    B, V, H, W, _ = imgs.shape
    rng = np.random.default_rng(1)
    gt = {}
    masks = {}
    for i, scale in enumerate((8, 4, 2, 1)):
        h, w = H // scale, W // scale
        gt[f"stage{i + 1}"] = jnp.asarray(rng.uniform(430, 890, (B, h, w)).astype(np.float32))
        masks[f"stage{i + 1}"] = jnp.asarray((rng.uniform(size=(B, h, w)) > 0.1).astype(np.float32))
    depth_interval = dv[:, 1] - dv[:, 0]

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, projs, dv, training=True,
            mutable=["batch_stats"], rngs={"droppath": jax.random.PRNGKey(2)},
        )
        loss, loss_dict = losses.total_loss(
            out, gt, masks, depth_interval, depth_type=cfg.depth_type,
            inverse_depth=cfg.inverse_depth,
        )
        return loss, loss_dict

    (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert set(loss_dict) == {"stage1", "stage2", "stage3", "stage4"}
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0.0
    # Backbone must receive gradient (it is not frozen in this config).
    vit_grads = jax.tree.leaves(grads["vit"])
    assert any(float(jnp.abs(g).max()) > 0 for g in vit_grads)


@pytest.mark.slow
def test_frozen_backbone_gets_no_grads():
    rng = np.random.default_rng(0)
    cfg = tiny_cfg(fix=True)
    model = build_model(cfg, dtype=jnp.float32)
    imgs, projs, dv = make_batch(rng)
    variables = jax.jit(
        lambda k: model.init(k, imgs, projs, dv, training=False)
    )(jax.random.PRNGKey(0))
    gt = {}
    masks = {}
    B, V, H, W, _ = imgs.shape
    for i, scale in enumerate((8, 4, 2, 1)):
        h, w = H // scale, W // scale
        gt[f"stage{i + 1}"] = jnp.asarray(rng.uniform(430, 890, (B, h, w)).astype(np.float32))
        masks[f"stage{i + 1}"] = jnp.ones((B, h, w), jnp.float32)
    depth_interval = dv[:, 1] - dv[:, 0]

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, projs, dv, training=True, mutable=["batch_stats"],
        )
        loss, _ = losses.total_loss(out, gt, masks, depth_interval, depth_type="ce")
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    vit_gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["vit"]))
    assert vit_gnorm == 0.0


@pytest.mark.slow
def test_eval_view_chunk_parity(model_and_vars):
    """Chunked-backbone eval (the HBM valve replacing the reference's
    eval-time view loop, mvsformer_model.py:379-399) must agree with the
    all-views-batched path."""
    cfg, model, variables, (imgs, projs, dv) = model_and_vars
    chunked = build_model(tiny_cfg(eval_view_chunk=2), dtype=jnp.float32)
    out_b = model.apply(variables, imgs, projs, dv, training=False,
                        tmp=[5.0, 5.0, 5.0, 1.0])
    out_c = chunked.apply(variables, imgs, projs, dv, training=False,
                          tmp=[5.0, 5.0, 5.0, 1.0])
    np.testing.assert_allclose(np.asarray(out_c["refined_depth"]),
                               np.asarray(out_b["refined_depth"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_c["photometric_confidence"]),
                               np.asarray(out_b["photometric_confidence"]),
                               rtol=1e-5, atol=1e-4)
