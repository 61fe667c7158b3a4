"""Depth-packed cost-regularization (ops/packed3d.py) vs the flax 3D path.

The packed inference path rewrites every NDHWC conv3d/deconv3d in the
CostRegNet / CostRegNet3D U-Nets as an NHWC conv2d over [B, H, W, D*C]
(reference models/module.py:469-594). It must be numerically exact — it is a
reindexing of the same parameters, not an approximation — including the
depth-strided variants and the block-banded transposed-conv kernels.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mvsformer_tpu.models.blocks import Conv3dNormAct, Deconv3dNormAct
from mvsformer_tpu.models.costreg import CostRegNet, CostRegNet3D
from mvsformer_tpu.ops import packed3d as pk
from mvsformer_tpu.ops.smallconv import SmallConv


def _randomize(rng, v):
    v = flax.core.unfreeze(v)
    v["params"] = jax.tree.map(
        lambda a: jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32)) * 0.2,
        v["params"])
    v["batch_stats"] = jax.tree.map(
        lambda a: jnp.abs(jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32))) * 0.5 + 0.5,
        v["batch_stats"])
    return v


def test_pack_conv3d_kernel_matches_conv3d():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 6, 10, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 6)).astype(np.float32))
    for sd in (1, 2):
        ref = jax.lax.conv_general_dilated(
            x, k, (sd, 2, 2), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        k2 = pk.pack_conv3d_kernel(k, 8, sd=sd, pd=1)
        y = jax.lax.conv_general_dilated(
            pk.pack_volume(x), k2, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = pk.unpack_volume(y, ref.shape[1])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_pack_deconv3d_kernel_matches_conv_transpose3d():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 5, 6, 6)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 6, 4)).astype(np.float32))
    for sd, (lo, hi) in [(2, (1, 2)), (1, (1, 1))]:
        ref = jax.lax.conv_transpose(
            x, k, (sd, 2, 2), ((lo, hi), (1, 2), (1, 2)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        k2 = pk.pack_deconv3d_kernel(k, 4, sd=sd, lo=lo, hi=hi)
        y = jax.lax.conv_transpose(
            pk.pack_volume(x), k2, (2, 2), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = pk.unpack_volume(y, ref.shape[1])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("C,D", [
    (8, 4),
    pytest.param(16, 8, marks=pytest.mark.slow),
])
def test_costregnet3d_packed_matches_flax(C, D):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((2, D, 16, 24, C)).astype(np.float32))
    m = CostRegNet3D(8, norm="BN", dtype=jnp.float32)
    v = _randomize(rng, m.init(jax.random.PRNGKey(0), x, True))
    y_packed = m.apply(v, x, False)  # eval gate -> packed path

    p, bst = v["params"], v["batch_stats"]

    def sub(name, mod, xx):
        vars_ = {"params": p[name]}
        if name in bst:
            vars_["batch_stats"] = bst[name]
        return mod.apply(vars_, xx, False)

    kw = dict(norm="BN", dtype=jnp.float32)
    s = (1, 2, 2)
    c2 = sub("conv2", Conv3dNormAct(16, **kw),
             sub("conv1", Conv3dNormAct(16, stride=s, **kw), x))
    c4 = sub("conv4", Conv3dNormAct(32, **kw),
             sub("conv3", Conv3dNormAct(32, stride=s, **kw), c2))
    bott = sub("conv6", Conv3dNormAct(64, **kw),
               sub("conv5", Conv3dNormAct(64, stride=s, **kw), c4))
    up = c4 + sub("conv7", Deconv3dNormAct(32, stride=s, **kw), bott)
    up = c2 + sub("conv9", Deconv3dNormAct(16, stride=s, **kw), up)
    inner = (nn.Conv(8, (1, 1, 1), dtype=jnp.float32).apply(
        {"params": p["inner"]}, x) if C != 8 else x)
    up = inner + sub("conv11", Deconv3dNormAct(8, stride=s, **kw), up)
    y_ref = SmallConv(1, (1, 1, 1), dtype=jnp.float32).apply(
        {"params": p["prob"]}, up)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("C,D,last", [
    pytest.param(8, 16, True, marks=pytest.mark.slow),
    (16, 8, False),
])
def test_costregnet_packed_matches_flax(C, D, last):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((1, D, 16, 24, C)).astype(np.float32))
    m = CostRegNet(8, last_layer=last, norm="BN", dtype=jnp.float32)
    v = _randomize(rng, m.init(jax.random.PRNGKey(0), x, True))
    y_packed = m.apply(v, x, False)

    p, bst = v["params"], v["batch_stats"]

    def sub(name, mod, xx):
        vars_ = {"params": p[name]}
        if name in bst:
            vars_["batch_stats"] = bst[name]
        return mod.apply(vars_, xx, False)

    kw = dict(norm="BN", dtype=jnp.float32)
    c2 = sub("conv2", Conv3dNormAct(16, **kw),
             sub("conv1", Conv3dNormAct(16, stride=2, **kw), x))
    c4 = sub("conv4", Conv3dNormAct(32, **kw),
             sub("conv3", Conv3dNormAct(32, stride=2, **kw), c2))
    bott = sub("conv6", Conv3dNormAct(64, **kw),
               sub("conv5", Conv3dNormAct(64, stride=2, **kw), c4))
    up = c4 + sub("conv7", Deconv3dNormAct(32, stride=2, **kw), bott)
    up = c2 + sub("conv9", Deconv3dNormAct(16, stride=2, **kw), up)
    inner = (nn.Conv(8, (1, 1, 1), dtype=jnp.float32).apply(
        {"params": p["inner"]}, x) if C != 8 else x)
    up = inner + sub("conv11", Deconv3dNormAct(8, stride=2, **kw), up)
    if last:
        up = SmallConv(1, (3, 3, 3), use_bias=False,
                       dtype=jnp.float32).apply({"params": p["prob"]}, up)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(up),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cls,C,D", [
    (CostRegNet3D, 8, 8),
    (CostRegNet, 16, 8),
])
def test_packed_train_matches_flax(cls, C, D):
    """packed_train=True must reproduce the flax TRAIN path exactly: output,
    updated running stats, and parameter gradients (real BatchNorm semantics
    computed in packed [B,H,W,D*C] space)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((2, D, 8, 16, C)).astype(np.float32))
    m_flax = cls(8, norm="BN", dtype=jnp.float32, packed_train=False)
    m_pack = cls(8, norm="BN", dtype=jnp.float32, packed_train=True)
    v = _randomize(rng, m_flax.init(jax.random.PRNGKey(0), x, True))

    y_ref, mut_ref = m_flax.apply(v, x, True, mutable=["batch_stats"])
    y_pk, mut_pk = m_pack.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        mut_pk["batch_stats"], mut_ref["batch_stats"])

    def loss(mod, params):
        y, _ = mod.apply({"params": params,
                          "batch_stats": v["batch_stats"]}, x, True,
                         mutable=["batch_stats"])
        return jnp.sum(jnp.square(y))

    g_ref = jax.grad(lambda p_: loss(m_flax, p_))(v["params"])
    g_pk = jax.grad(lambda p_: loss(m_pack, p_))(v["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3),
        g_pk, g_ref)


def test_packed_train_bn_sync_matches_flax():
    """With axis_name set, the packed-train BN must pmean its moments the
    way flax SyncBN does: per-shard packed output == flax output under an
    8-device shard_map over the batch."""
    from jax.sharding import Mesh, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    n = min(4, len(jax.devices()))
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.standard_normal((n, 8, 8, 16, 8)).astype(np.float32))
    m_flax = CostRegNet3D(8, norm="BN", dtype=jnp.float32,
                          axis_name="data", packed_train=False)
    m_pack = CostRegNet3D(8, norm="BN", dtype=jnp.float32,
                          axis_name="data", packed_train=True)
    v = _randomize(rng, CostRegNet3D(8, norm="BN", dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x, True))
    mesh = Mesh(np.array(jax.devices()[:n]), ("data",))

    def run(mod):
        def step(xs):
            y, mut = mod.apply(v, xs, True, mutable=["batch_stats"])
            return y, mut["batch_stats"]
        return jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=P("data"),
            out_specs=(P("data"), P())))(x)

    y_ref, bs_ref = run(m_flax)
    y_pk, bs_pk = run(m_pack)
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        bs_pk, bs_ref)
