"""Coverage for secondary API surface: multistep LR, legacy losses,
cross-view attention, ETH3D schedulers."""

import numpy as np

import jax
import jax.numpy as jnp

from mvsformer_tpu.models.dino import vit_small
from mvsformer_tpu.ops import hypotheses, losses
from mvsformer_tpu.train.optim import warmup_multistep_schedule


def test_warmup_multistep_schedule():
    f = warmup_multistep_schedule(1.0, [100, 200], gamma=0.1, warmup_iters=10)
    np.testing.assert_allclose(float(f(0)), 1 / 3, rtol=1e-5)
    np.testing.assert_allclose(float(f(50)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(f(150)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(f(250)), 0.01, rtol=1e-6)


def test_simple_loss(rng):
    est = jnp.asarray(rng.uniform(400, 900, (1, 8, 8)).astype(np.float32))
    gt = est + 2.0
    mask = jnp.ones((1, 8, 8), jnp.float32)
    # smooth-L1 with |err|=2 > beta=1: err - 0.5 = 1.5
    np.testing.assert_allclose(float(losses.simple_loss(est, gt, mask)), 1.5,
                               rtol=1e-5)


def test_bimodal_loss_shapes(rng):
    B, H, W = 1, 6, 6
    outputs = {"stage1": {
        "depth0": jnp.asarray(rng.uniform(400, 900, (B, H, W)).astype(np.float32)),
        "depth1": jnp.asarray(rng.uniform(400, 900, (B, H, W)).astype(np.float32)),
        "sigma0": jnp.full((B, H, W), 2.0, jnp.float32),
        "sigma1": jnp.full((B, H, W), 2.0, jnp.float32),
        "pi0": jnp.full((B, H, W), 0.5, jnp.float32),
        "pi1": jnp.full((B, H, W), 0.5, jnp.float32),
    }}
    gt = {"stage1": jnp.asarray(rng.uniform(400, 900, (B, H, W)).astype(np.float32))}
    mask = {"stage1": jnp.ones((B, H, W), jnp.float32)}
    itv = jnp.asarray([2.5], jnp.float32)
    out = losses.bimodal_loss(outputs, gt, mask, itv, dlossw=(1.0,),
                              stage_keys=("stage1",))
    assert np.isfinite(float(out["stage1"]))


def test_cross_attention_paths(rng):
    m = vit_small(dtype=jnp.float32, cross_att=True, nview=3)
    x = jnp.asarray(rng.standard_normal((3, 64, 64, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    # cross blocks exist in the param tree
    assert any(k.startswith("cross_block") for k in v["params"])
    tok, att = m.apply(v, x)
    assert tok.shape == (3, 17, 384)
    epi = jnp.asarray(rng.standard_normal((1, 2, 2)).astype(np.float32) * 100)
    tok2, _ = m.apply(v, x, epipoles=epi)
    assert np.isfinite(np.asarray(tok2)).all()
    # zero-init gates: without training the cross block is a near-identity
    np.testing.assert_allclose(np.asarray(tok), np.asarray(tok2), atol=1e-4)


def test_eth3d_schedulers(rng):
    dv = jnp.asarray(np.sort(rng.uniform(0.5, 40, (1, 16)).astype(np.float32)))
    out = hypotheses.init_inverse_range_clamped(dv, 8, 4, 4, dmin=0.01, dmax=50.0)
    assert np.isfinite(np.asarray(out)).all()
    depth = jnp.asarray(rng.uniform(1.0, 30.0, (1, 4, 4)).astype(np.float32))
    hypo = hypotheses.init_inverse_range(dv, 8, 4, 4)
    out2 = hypotheses.schedule_inverse_range_clamped(depth, hypo, 8, 1.5, 8, 8)
    arr = np.asarray(out2)
    assert np.isfinite(arr).all()
    assert (arr > 0).all()  # the clamp keeps inverse depth away from zero
