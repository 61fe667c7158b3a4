"""Parity test for the fused eval depth decode (ops/pallas/stage_tail)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mvsformer_tpu.ops import regression
from mvsformer_tpu.ops.pallas.stage_tail import fused_depth_decode


@pytest.fixture
def rng():
    return np.random.default_rng(3)


@pytest.mark.parametrize("shape", [(1, 8, 24, 160), (2, 32, 16, 128)])
def test_fused_depth_decode_matches_decode_depth(rng, shape):
    B, D, H, W = shape
    logits = jnp.asarray(rng.standard_normal((B, D, H, W)) * 3, jnp.float32)
    dv = jnp.asarray(
        np.sort(rng.uniform(400, 900, (B, D, H, W)).astype(np.float32),
                axis=1))
    tmp = 5.0

    prob = jax.nn.softmax(logits, axis=1)
    depth_want, conf_want = regression.decode_depth(
        logits, prob, dv, "ce", D, training=False, tmp=tmp)

    with pltpu.force_tpu_interpret_mode():
        depth_got, conf_got = fused_depth_decode(logits, dv, tmp)

    np.testing.assert_allclose(np.asarray(depth_got), np.asarray(depth_want),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(conf_got), np.asarray(conf_want),
                               rtol=1e-5, atol=1e-6)
