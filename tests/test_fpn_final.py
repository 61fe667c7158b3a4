"""Parity tests for the fused final-FPN-level kernel (ops/pallas/fpn_final).

Oracle = the exact FPNDecoder reference-path math for the final level:
swish(BN_affine(Conv3x3(up2(intra2) + Conv1x1(lateral)))) with the
align_corners=True 2x bilinear of ops/resize.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mvsformer_tpu.ops.pallas.fpn_final import fpn_final_level
from mvsformer_tpu.ops.resize import resize_bilinear


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _oracle(intra2, lateral, w1, b1, k3, b3, mul, add):
    up = resize_bilinear(
        intra2, (2 * intra2.shape[1], 2 * intra2.shape[2]),
        spatial_axes=(1, 2), align_corners=True)
    intra = up + (lateral @ w1[0, 0] + b1)
    pre = jax.lax.conv_general_dilated(
        intra, k3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b3
    y = pre * mul + add
    return y * jax.nn.sigmoid(y)


def test_fpn_final_matches_reference_chain(rng):
    N, h, w = 2, 16, 128
    intra2 = jnp.asarray(rng.standard_normal((N, h, w, 64)), jnp.float32)
    lateral = jnp.asarray(
        rng.standard_normal((N, 2 * h, 2 * w, 8)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((1, 1, 8, 64)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 64, 8)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    mul = jnp.asarray(rng.uniform(0.5, 1.5, (8,)), jnp.float32)
    add = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)

    want = np.asarray(_oracle(intra2, lateral, w1, b1, k3, b3, mul, add))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fpn_final_level(
            intra2, lateral, w1, b1, k3, b3, (mul, add)))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fpn_level2_chain_matches_reference(rng):
    """Generalized level (cl=16, co=16) with emit_intra: the chained
    level-2 -> level-3 kernel pair must reproduce the XLA two-level chain."""
    from mvsformer_tpu.ops.pallas.fpn_final import fpn_level

    N, h1, w1_ = 1, 8, 128  # level-2 input res; out2 16x256, final 32x512
    intra1 = jnp.asarray(rng.standard_normal((N, h1, w1_, 64)), jnp.float32)
    lat2 = jnp.asarray(
        rng.standard_normal((N, 2 * h1, 2 * w1_, 16)), jnp.float32)
    lat3 = jnp.asarray(
        rng.standard_normal((N, 4 * h1, 4 * w1_, 8)), jnp.float32)

    def params(cl, co):
        return (
            jnp.asarray(rng.standard_normal((1, 1, cl, 64)) * 0.3, jnp.float32),
            jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((3, 3, 64, co)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32),
            (jnp.asarray(rng.uniform(0.5, 1.5, (co,)), jnp.float32),
             jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)),
        )

    p2 = params(16, 16)
    p3 = params(8, 8)

    # XLA reference chain
    def level_ref(intra_prev, lateral, w1, b1, k3, b3, bn):
        up = resize_bilinear(
            intra_prev, (2 * intra_prev.shape[1], 2 * intra_prev.shape[2]),
            spatial_axes=(1, 2), align_corners=True)
        intra = up + (lateral @ w1[0, 0] + b1)
        pre = jax.lax.conv_general_dilated(
            intra, k3, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b3
        y = pre * bn[0] + bn[1]
        return y * jax.nn.sigmoid(y), intra

    out2_want, intra2 = level_ref(intra1, lat2, *p2)
    out3_want, _ = level_ref(intra2, lat3, *p3)

    with pltpu.force_tpu_interpret_mode():
        out2_got, intra_cw = fpn_level(intra1, lat2, *p2, emit_intra=True)
        out3_got = fpn_level(intra_cw, lat3, *p3)

    np.testing.assert_allclose(np.asarray(out2_got), np.asarray(out2_want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out3_got), np.asarray(out3_want),
                               rtol=5e-4, atol=5e-4)


def test_encoder_decoder_fused_chain_matches_flax(rng, monkeypatch):
    """FPNEncoder(fused_head) + FPNDecoder(fused_final) must reproduce the
    flax reference chain end-to-end (eval, folded BN, shared params)."""
    from mvsformer_tpu.models import fpn as fpn_mod

    monkeypatch.setattr(fpn_mod, "_on_tpu", lambda: True)

    N, H, W = 1, 32, 256
    x = jnp.asarray(rng.standard_normal((N, H, W, 3)), jnp.float32)

    def build(fused):
        enc = fpn_mod.FPNEncoder(norm="BN", dtype=jnp.float32,
                                 fused_head=fused)
        dec = fpn_mod.FPNDecoder(norm="BN", dtype=jnp.float32,
                                 fused_final=fused)
        return enc, dec

    enc_ref, dec_ref = build(False)
    enc_f, dec_f = build(True)
    ev = enc_ref.init(jax.random.PRNGKey(0), x, training=False)
    feats = enc_ref.apply(ev, x, training=False)
    dv = dec_ref.init(jax.random.PRNGKey(1), *feats, training=False)

    want = dec_ref.apply(dv, *enc_ref.apply(ev, x, training=False),
                         training=False)
    with pltpu.force_tpu_interpret_mode():
        got = dec_f.apply(dv, *enc_f.apply(ev, x, training=False),
                          training=False)

    for g, w_, name in zip(got, want, ("out0", "out1", "out2", "out3")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_fpn_final_bf16_close(rng):
    """bf16 compute path stays within bf16-scale error of the f32 oracle."""
    N, h, w = 1, 8, 128
    intra2_f = rng.standard_normal((N, h, w, 64)).astype(np.float32)
    lateral_f = rng.standard_normal((N, 2 * h, 2 * w, 8)).astype(np.float32)
    w1 = jnp.asarray(rng.standard_normal((1, 1, 8, 64)) * 0.3, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 64, 8)) * 0.1, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    mul = jnp.asarray(rng.uniform(0.5, 1.5, (8,)), jnp.float32)
    add = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)

    want = np.asarray(_oracle(jnp.asarray(intra2_f), jnp.asarray(lateral_f),
                              w1, b1, k3, b3, mul, add))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fpn_final_level(
            jnp.asarray(intra2_f, jnp.bfloat16),
            jnp.asarray(lateral_f, jnp.bfloat16),
            w1, b1, k3, b3, (mul, add))).astype(np.float32)

    # bf16 inputs + bf16 z matmul: expect ~1e-2 relative agreement
    err = np.abs(got - want)
    scale = np.abs(want) + 1.0
    assert (err / scale).max() < 5e-2, (err / scale).max()
