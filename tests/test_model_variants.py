"""Coverage for the model-variant matrix: DINOMVSNet, epipole/epipoleV2
fusion, was/mixup_ce/re depth types — forward + loss + grad finiteness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsformer_tpu.config import ModelConfig, ViTConfig
from mvsformer_tpu.models.mvsformer import build_model
from mvsformer_tpu.ops import losses

from tests.test_model import make_batch


def make_gt(rng, B, H, W):
    gt, masks = {}, {}
    for i, sc in enumerate((8, 4, 2, 1)):
        gt[f"stage{i+1}"] = jnp.asarray(
            rng.uniform(430, 890, (B, H // sc, W // sc)).astype(np.float32))
        masks[f"stage{i+1}"] = jnp.ones((B, H // sc, W // sc), jnp.float32)
    return gt, masks


CASES = [
    # Full forward+grad per variant is minutes on CPU (the sinkhorn VJP in
    # "was" alone was 370s); the whole matrix runs in the slow/nightly tier.
    # The fast tier covers variant WIRING via the forward-only smoke below.
    pytest.param("dino", "cnn", "ce", marks=pytest.mark.slow),
    pytest.param("twin", "epipole", "re", marks=pytest.mark.slow),
    pytest.param("twin", "epipoleV2", "mixup_ce", marks=pytest.mark.slow),
    pytest.param("twin", "cnn", "was", marks=pytest.mark.slow),
]

SMOKE_CASES = [
    ("twin", "epipole", "re"),
    ("twin", "epipoleV2", "mixup_ce"),
    ("twin", "cnn", "was"),
]


@pytest.mark.parametrize("model_type,fusion,depth_type", SMOKE_CASES)
def test_variant_forward_smoke(model_type, fusion, depth_type):
    """Fast tier: ONE jitted eval forward per variant, loss value computed
    from its training-mode outputs in the same trace (no grad — the
    expensive VJPs are exercised by the slow matrix above)."""
    rng = np.random.default_rng(0)
    cfg = ModelConfig(
        model_type=model_type, fusion_type=fusion, depth_type=depth_type,
        ndepths=[4, 4, 2, 2], norm_type="GN", inverse_depth=True)
    cfg.vit_args.drop_path_rate = 0.0
    model = build_model(cfg, dtype=jnp.float32)

    imgs, projs, dv = make_batch(rng, B=1, V=2, H=64, W=64, ndepth_full=32)
    gt, masks = make_gt(rng, 1, 64, 64)

    @jax.jit
    def init_and_eval(k):
        variables = model.init(k, imgs, projs, dv, training=False)
        out = model.apply(variables, imgs, projs, dv, training=True)
        loss, _ = losses.total_loss(out, gt, masks, dv[:, 1] - dv[:, 0],
                                    depth_type=depth_type,
                                    inverse_depth=cfg.inverse_depth)
        return out["refined_depth"], loss

    depth, loss = init_and_eval(jax.random.PRNGKey(0))
    assert depth.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(depth)).all()
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("model_type,fusion,depth_type", CASES)
def test_variant_forward_and_grads(model_type, fusion, depth_type):
    rng = np.random.default_rng(0)
    cfg = ModelConfig(
        model_type=model_type, fusion_type=fusion, depth_type=depth_type,
        ndepths=[4, 4, 2, 2], norm_type="GN", inverse_depth=True)
    cfg.vit_args.drop_path_rate = 0.0
    if model_type == "dino":
        cfg.vit_args = ViTConfig(twin=False, vit_arch="vit_small", vit_ch=384,
                                 out_ch=64, att_fusion=True, nhead=6)
    model = build_model(cfg, dtype=jnp.float32)

    imgs, projs, dv = make_batch(rng, B=1, V=3, H=64, W=64, ndepth_full=32)
    variables = jax.jit(
        lambda k: model.init(k, imgs, projs, dv, training=False)
    )(jax.random.PRNGKey(0))

    out = model.apply(variables, imgs, projs, dv, training=False,
                      tmp=[5.0, 5.0, 5.0, 1.0])
    assert out["refined_depth"].shape == (1, 64, 64)
    assert np.isfinite(np.asarray(out["refined_depth"])).all()
    assert np.isfinite(np.asarray(out["photometric_confidence"])).all()

    gt, masks = make_gt(rng, 1, 64, 64)

    def loss_fn(p):
        o = model.apply({"params": p, **{k: v for k, v in variables.items()
                                         if k != "params"}},
                        imgs, projs, dv, training=True)
        loss, _ = losses.total_loss(o, gt, masks, dv[:, 1] - dv[:, 0],
                                    depth_type=depth_type,
                                    inverse_depth=cfg.inverse_depth)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss)), f"{model_type}/{fusion}/{depth_type}"
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
