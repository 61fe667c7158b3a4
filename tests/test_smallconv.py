"""SmallConv (matmul+shift-add tiny-C_out conv) parity vs flax nn.Conv.

The reformulation must be numerically exact (same contraction dtype) and
param-tree identical, since it replaces nn.Conv at checkpointed sites
(costreg prob heads, VisibilityNet conv3, FPN out blocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mvsformer_tpu.ops.smallconv import SmallConv, small_conv


def _pair(features, ks, use_bias, dtype=jnp.float32):
    small = SmallConv(features, ks, use_bias=use_bias, dtype=dtype)
    ref = nn.Conv(features, ks, padding="SAME", use_bias=use_bias, dtype=dtype)
    return small, ref


@pytest.mark.parametrize("shape,ks,cout,use_bias", [
    ((2, 9, 11, 8), (3, 3), 1, True),       # VisibilityNet-esque 2D
    ((2, 9, 11, 8), (1, 1), 1, True),       # 1x1 head
    ((2, 9, 11, 64), (3, 3), 8, True),      # FPN out3
    ((1, 6, 7, 9, 8), (3, 3, 3), 1, False), # CostRegNet prob (3D, no bias)
    ((1, 6, 7, 9, 8), (1, 1, 1), 1, True),  # CostRegNet3D prob
    ((2, 5, 6, 16), (5, 5), 4, True),       # 5-tap kernel
])
def test_parity_vs_nn_conv(shape, ks, cout, use_bias):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, jnp.float32)
    small, ref = _pair(cout, ks, use_bias)
    params = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(params, x)
    y_small = small.apply(params, x)  # same tree feeds both
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_param_tree_identical():
    x = jnp.zeros((1, 4, 4, 8))
    small, ref = _pair(1, (3, 3), True)
    ps = jax.tree.map(lambda a: (a.shape, a.dtype),
                      small.init(jax.random.PRNGKey(0), x))
    pr = jax.tree.map(lambda a: (a.shape, a.dtype),
                      ref.init(jax.random.PRNGKey(0), x))
    assert ps == pr


def test_gradients_match():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 6, 8))
    small, ref = _pair(2, (3, 3), True)
    params = ref.init(jax.random.PRNGKey(3), x)

    def loss(fn, p, x):
        return jnp.sum(fn.apply(p, x) ** 2)

    gs = jax.grad(lambda p: loss(small, p, x))(params)
    gr = jax.grad(lambda p: loss(ref, p, x))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), gs, gr)
    gx_s = jax.grad(lambda x: loss(small, params, x))(x)
    gx_r = jax.grad(lambda x: loss(ref, params, x))(x)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)


def test_functional_even_shape_guard():
    # even spatial extents + odd kernels, 3D
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 6, 8))
    k = jax.random.normal(jax.random.PRNGKey(5), (3, 1, 3, 8, 2)) * 0.1
    ref = jax.lax.conv_general_dilated(
        jnp.moveaxis(x, -1, 1), jnp.transpose(k, (4, 3, 0, 1, 2)),
        (1, 1, 1), "SAME")
    out = small_conv(x, k)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(ref, 1, -1)),
                               np.asarray(out), rtol=1e-4, atol=1e-5)
