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


@pytest.mark.parametrize("shape,ks,cout,strides", [
    ((2, 9, 11, 8), (3, 3), 16, (2, 2)),          # 2D strided down-conv
    ((1, 6, 9, 11, 8), (3, 3, 3), 16, (2, 2, 2)), # CostRegNet down-conv
    ((1, 6, 9, 11, 8), (3, 3, 3), 16, (1, 2, 2)), # CostRegNet3D down-conv
    ((1, 6, 10, 12, 16), (1, 3, 3), 32, (1, 2, 2)),  # CostRegNet2D
    ((2, 9, 12, 3), (5, 5), 8, (2, 2)),           # 5-tap strided
])
def test_strided_parity_vs_nn_conv(shape, ks, cout, strides):
    """Strided path (space-to-depth + matmul) vs nn.Conv w/ torch padding."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, jnp.float32)
    pad = tuple(((k - 1) // 2,) * 2 for k in ks)
    ref = nn.Conv(cout, ks, strides=strides, padding=pad,
                  use_bias=True, dtype=jnp.float32)
    small = SmallConv(cout, ks, strides=strides, use_bias=True,
                      dtype=jnp.float32)
    params = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(params, x)
    y_small = small.apply(params, x)
    assert y_ref.shape == y_small.shape
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,ks,cout,strides,pad", [
    # Deconv3dNormAct: torch ConvTranspose3d(k3, p1, op=s-1) alignment
    ((1, 4, 5, 6, 16), (3, 3, 3), 8, (2, 2, 2), ((1, 2), (1, 2), (1, 2))),
    ((1, 4, 5, 6, 16), (3, 3, 3), 8, (1, 2, 2), ((1, 1), (1, 2), (1, 2))),
    # _Deconv2dIn3d: k=(1,3,3), s=(1,2,2), p=(0,1,1), op=(0,1,1)
    ((1, 4, 5, 6, 16), (1, 3, 3), 8, (1, 2, 2), ((0, 0), (1, 2), (1, 2))),
    # Deconv2dNormAct: torch ConvTranspose2d(k4, s2, p1)
    ((2, 7, 9, 32), (4, 4), 16, (2, 2), ((2, 2), (2, 2))),
])
def test_transpose_parity_vs_nn_conv_transpose(shape, ks, cout, strides, pad):
    """Phase-decomposition deconv vs nn.ConvTranspose (explicit padding)."""
    from mvsformer_tpu.ops.smallconv import SmallConvTranspose

    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    ref = nn.ConvTranspose(cout, ks, strides=strides, padding=pad,
                           use_bias=False, dtype=jnp.float32)
    small = SmallConvTranspose(cout, ks, strides=strides, padding=pad,
                               use_bias=False, dtype=jnp.float32)
    params = ref.init(jax.random.PRNGKey(1), x)
    y_ref = ref.apply(params, x)
    y_small = small.apply(params, x)
    assert y_ref.shape == y_small.shape
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_strided_and_transpose_gradients_match():
    """Autodiff through both new paths agrees with the flax originals."""
    from mvsformer_tpu.ops.smallconv import small_conv_transpose

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 6, 8, 8))
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 8, 16)) * 0.1
    pad = tuple(((kk - 1) // 2,) * 2 for kk in (3, 3, 3))
    g1 = jax.grad(lambda k_: jnp.sum(
        jnp.sin(small_conv(x, k_, strides=(1, 2, 2)))))(k)
    g2 = jax.grad(lambda k_: jnp.sum(jnp.sin(
        nn.Conv(16, (3, 3, 3), strides=(1, 2, 2), padding=pad,
                use_bias=False).apply({"params": {"kernel": k_}}, x))))(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)

    xt = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 4, 5, 16))
    kt = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 3, 16, 8)) * 0.1
    padt = ((1, 2), (1, 2), (1, 2))
    g1 = jax.grad(lambda k_: jnp.sum(jnp.sin(
        small_conv_transpose(xt, k_, (2, 2, 2), padt))))(kt)
    g2 = jax.grad(lambda k_: jnp.sum(jnp.sin(
        nn.ConvTranspose(8, (3, 3, 3), strides=(2, 2, 2), padding=padt,
                         use_bias=False).apply(
            {"params": {"kernel": k_}}, xt))))(kt)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,ks,cout", [
    ((2, 8, 12, 3), (7, 7), 8),    # FPN conv00
    ((2, 8, 12, 8), (5, 5), 8),    # FPN conv01
    ((1, 6, 10, 16), (3, 3), 16),  # generic odd-3x3
])
def test_s2d_parity_vs_nn_conv(shape, ks, cout):
    """small_conv_s2d (space-to-depth phase conv) == torch-padded nn.Conv,
    including zero-padded borders, values and gradients."""
    from mvsformer_tpu.ops.smallconv import small_conv_s2d

    x = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    ref = nn.Conv(cout, ks, padding="SAME", use_bias=True, dtype=jnp.float32)
    params = ref.init(jax.random.PRNGKey(5), x)
    k = params["params"]["kernel"]
    b = params["params"]["bias"]
    y_ref = ref.apply(params, x)
    y = small_conv_s2d(x, k, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(k, b, x):
        return jnp.sum(small_conv_s2d(x, k, b) ** 2)

    def loss_ref(k, b, x):
        p = {"params": {"kernel": k, "bias": b}}
        return jnp.sum(ref.apply(p, x) ** 2)

    for i, (a, r) in enumerate(zip(jax.grad(loss, argnums=(0, 1, 2))(k, b, x),
                                   jax.grad(loss_ref, argnums=(0, 1, 2))(k, b, x))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"grad argnum {i}")


def test_s2d_module_param_tree_identical():
    x = jnp.zeros((1, 4, 6, 3))
    small = SmallConv(8, (7, 7), phase_s2d=True, dtype=jnp.float32)
    ref = nn.Conv(8, (7, 7), padding="SAME", dtype=jnp.float32)
    ps = jax.tree.map(lambda a: (a.shape, a.dtype),
                      small.init(jax.random.PRNGKey(0), x))
    pr = jax.tree.map(lambda a: (a.shape, a.dtype),
                      ref.init(jax.random.PRNGKey(0), x))
    assert ps == pr
