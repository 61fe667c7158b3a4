"""Parity test for the fused encoder-head kernel (ops/pallas/encoder_head).

Oracle = the FPNEncoder head math in f32: conv00 (7x7, 3->8) -> folded-BN
affine -> leaky_relu(0.1), conv01 (5x5, 8->8) -> affine -> lrelu,
downsample1 (5x5 stride 2, 8->16) -> affine -> lrelu; torch padding
(= SAME for these odd kernels at stride 1; (2,2) explicit at stride 2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mvsformer_tpu.ops.pallas.encoder_head import encoder_head


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _conv(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride),
        [((k.shape[0] - 1) // 2,) * 2, ((k.shape[1] - 1) // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _lrelu(x):
    return jnp.maximum(x, 0.1 * x)


def _oracle(img, k7, a00, k5, a01, kd, ad):
    c00 = _lrelu(_conv(img, k7, 1) * a00[0] + a00[1])
    c01 = _lrelu(_conv(c00, k5, 1) * a01[0] + a01[1])
    d0 = _lrelu(_conv(c01, kd, 2) * ad[0] + ad[1])
    return c01, d0


def test_encoder_head_matches_reference_chain(rng):
    N, H, W = 2, 32, 256
    img = jnp.asarray(rng.standard_normal((N, H, W, 3)), jnp.float32)
    k7 = jnp.asarray(rng.standard_normal((7, 7, 3, 8)) * 0.15, jnp.float32)
    k5 = jnp.asarray(rng.standard_normal((5, 5, 8, 8)) * 0.15, jnp.float32)
    kd = jnp.asarray(rng.standard_normal((5, 5, 8, 16)) * 0.15, jnp.float32)
    a00 = (jnp.asarray(rng.uniform(0.5, 1.5, 8), jnp.float32),
           jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32))
    a01 = (jnp.asarray(rng.uniform(0.5, 1.5, 8), jnp.float32),
           jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32))
    ad = (jnp.asarray(rng.uniform(0.5, 1.5, 16), jnp.float32),
          jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32))

    c01_want, d0_want = _oracle(img, k7, a00, k5, a01, kd, ad)
    c01_want = np.asarray(c01_want)
    d0_want = np.asarray(d0_want)

    with pltpu.force_tpu_interpret_mode():
        latt, down0 = encoder_head(img, k7, a00, k5, a01, kd, ad)

    # latt rows are (phase, c): un-phase to NHWC
    w = W // 2
    c01_got = np.asarray(jnp.transpose(
        latt.reshape(N, H, 2, 8, w), (0, 1, 4, 2, 3)).reshape(N, H, W, 8))
    d0_got = np.asarray(down0)

    np.testing.assert_allclose(c01_got, c01_want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(d0_got, d0_want, rtol=2e-4, atol=2e-4)
