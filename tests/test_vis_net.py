"""Fused VisibilityNet Pallas kernel vs the flax module (interpret mode).

The kernel replaces the whole entropy->weight CNN at BN inference
(models/stagenet.py VisibilityNet fast path); it must agree with the flax
path on the same parameter tree, including the zero-padding semantics at
image borders (rows AND columns) and across row-block boundaries.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsformer_tpu.models.stagenet import VisibilityNet
from mvsformer_tpu.ops.pallas.vis_net import fused_visibility


def _random_variables(rng, ent, dtype):
    net = VisibilityNet(norm="BN", dtype=dtype)
    v = flax.core.unfreeze(net.init(jax.random.PRNGKey(0), ent, False))

    def rk(a, s):
        return jnp.asarray(rng.standard_normal(a.shape).astype(np.float32)) * s

    for c, fan in [("conv0", 9), ("conv1", 144), ("conv2", 144)]:
        v["params"][c]["Conv_0"]["kernel"] = rk(
            v["params"][c]["Conv_0"]["kernel"], fan ** -0.5)
        bn_p = v["params"][c]["Norm_0"]["BatchNorm_0"]
        bn_p["scale"] = 1.0 + rk(bn_p["scale"], 0.1)
        bn_p["bias"] = rk(bn_p["bias"], 0.1)
        bn_s = v["batch_stats"][c]["Norm_0"]["BatchNorm_0"]
        bn_s["mean"] = rk(bn_s["mean"], 0.3)
        bn_s["var"] = jnp.abs(rk(bn_s["var"], 1.0)) + 0.5
    v["params"]["conv3"]["kernel"] = rk(v["params"]["conv3"]["kernel"], 0.35)
    v["params"]["conv3"]["bias"] = rk(v["params"]["conv3"]["bias"], 0.1)
    return net, v


def _kernel_args(v):
    p, bs = v["params"], v["batch_stats"]

    def st(c):
        bn_p = p[c]["Norm_0"]["BatchNorm_0"]
        bn_s = bs[c]["Norm_0"]["BatchNorm_0"]
        return (bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"])

    return (p["conv0"]["Conv_0"]["kernel"], p["conv1"]["Conv_0"]["kernel"],
            p["conv2"]["Conv_0"]["kernel"], p["conv3"]["kernel"],
            p["conv3"]["bias"], (st("conv0"), st("conv1"), st("conv2")))


@pytest.mark.parametrize("shape,block_rows", [
    ((1, 40, 256), 8),   # multiple row blocks, borders exercised
    ((2, 32, 128), 12),  # H not divisible by block_rows; batch > 1
])
def test_fused_visibility_matches_flax(shape, block_rows):
    rng = np.random.default_rng(0)
    B, H, W = shape
    ent = jnp.asarray(rng.standard_normal((B, H, W, 1)).astype(np.float32))
    net, v = _random_variables(rng, ent, jnp.float32)

    y_ref = net.apply(v, ent, False)  # flax path (CPU platform -> no kernel)
    k0, k1, k2, k3, b3, stats = _kernel_args(v)
    y_k = fused_visibility(ent[..., 0], k0, k1, k2, k3, b3, stats,
                           block_rows=block_rows, interpret=True)
    np.testing.assert_allclose(np.asarray(y_k),
                               np.asarray(y_ref[..., 0]), atol=6e-3)


def test_border_zero_padding_semantics():
    """Constant input: interior rows identical, borders differ exactly as
    torch zero-padding dictates (regression test for the halo masking)."""
    rng = np.random.default_rng(1)
    B, H, W = 1, 32, 128
    ent = jnp.ones((B, H, W, 1), jnp.float32)
    net, v = _random_variables(rng, ent, jnp.float32)
    y_ref = net.apply(v, ent, False)
    k0, k1, k2, k3, b3, stats = _kernel_args(v)
    y_k = fused_visibility(ent[..., 0], k0, k1, k2, k3, b3, stats,
                           block_rows=8, interpret=True)
    # borders (first/last 3 rows) are where halo bugs show up
    np.testing.assert_allclose(np.asarray(y_k[:, :4]),
                               np.asarray(y_ref[..., 0][:, :4]), atol=6e-3)
    np.testing.assert_allclose(np.asarray(y_k[:, -4:]),
                               np.asarray(y_ref[..., 0][:, -4:]), atol=6e-3)
