"""3D cost-volume regularization U-Nets (NDHWC).

Functional spec: /root/reference/models/module.py:469-594 — three U-Net
variants over [B, D, H, W, G] volumes: CostRegNet (stride 2 in depth AND
space; used when D > model_th), CostRegNet3D (stride 2 in space only — keeps
D; used for small-D stages), CostRegNet2D ((1,3,3) kernels for the epipole
mode). These are hot path #3; on TPU they lower to MXU-tiled NDHWC conv3d.
The parallel layer depth-slab-shards CostRegNet3D trivially (no D-stride);
CostRegNet's D-strided path stays replicated per slab (SURVEY.md section 7).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mvsformer_tpu.models.blocks import Conv3dNormAct, Deconv3dNormAct
from mvsformer_tpu.ops.smallconv import SmallConv

Dtype = Any


def _packed_bn_train(y, bn_p, bn_s, d_out, dt, axis_name):
    """Train-mode BatchNorm over the packed [B, H, W, d*C] layout.

    Per-channel stats (the reference BatchNorm3d reduces over B, D, H, W per
    C — module.py:469-594) are computed WITHOUT unpacking: the packed axis is
    (d, C) row-major, so a free reshape view exposes C for an fp32 reduce.
    Mirrors flax nn.BatchNorm train mode exactly: fp32 moments (pmean-synced
    over `axis_name` when given), biased variance clamped at 0, running
    stats updated with momentum 0.9, normalization applied in the compute
    dtype. Returns (relu(normalized), new_running_stats)."""
    import jax

    b, h, w, dc = y.shape
    c = dc // d_out
    y5 = y.reshape(b, h, w, d_out, c)
    y32 = y5.astype(jnp.float32)
    mu = jnp.mean(y32, axis=(0, 1, 2, 3))
    mu2 = jnp.mean(jnp.square(y32), axis=(0, 1, 2, 3))
    if axis_name is not None:
        mu, mu2 = jax.lax.pmean((mu, mu2), axis_name)
    var = jnp.maximum(mu2 - jnp.square(mu), 0.0)
    mom = 0.9
    new_stats = {
        "mean": mom * bn_s["mean"].astype(jnp.float32) + (1 - mom) * mu,
        "var": mom * bn_s["var"].astype(jnp.float32) + (1 - mom) * var,
    }
    mul = jax.lax.rsqrt(var.astype(dt) + jnp.asarray(1e-5, dt))
    mul = mul * bn_p["scale"].astype(dt)
    yn = (y5.astype(dt) - mu.astype(dt)) * mul + bn_p["bias"].astype(dt)
    return jnp.maximum(yn.reshape(b, h, w, dc), 0), new_stats


class CostRegNet(nn.Module):
    """Full 3D U-Net, stride 2 in (D, H, W)."""

    base_ch: int = 8
    last_layer: bool = True
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None
    packed_train: bool = False

    def _packed(self, x, training=False):
        """Depth-packed forward (see CostRegNet3D._packed / ops/packed3d.py).
        Here the depth axis is ALSO strided: the packed kernels carry the
        D-stride as block-band structure (sd=2 down, transposed sd=2 up).
        Requires D % 8 == 0 (three 2x depth levels). training=True keeps
        real BatchNorm semantics (stats computed in packed space,
        running-stat updates written back) instead of the folded affine."""
        import jax

        from mvsformer_tpu.ops import packed3d as pk

        B, D, H, W, C = x.shape
        c = self.base_ch
        p = self.variables["params"]
        bs = self.variables.get("batch_stats", {})
        dt = self.dtype
        new_stats = {}
        xp = pk.pack_volume(x).astype(dt)

        def fold(name, d_out):
            bn_p = p[name]["Norm_0"]["BatchNorm_0"]
            bn_s = bs[name]["Norm_0"]["BatchNorm_0"]
            inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + 1e-5)
            mul = bn_p["scale"].astype(jnp.float32) * inv
            add = (bn_p["bias"].astype(jnp.float32)
                   - bn_s["mean"].astype(jnp.float32) * mul)
            return jnp.tile(mul, d_out).astype(dt), \
                jnp.tile(add, d_out).astype(dt)

        def norm_act(y, name, d_out):
            if not training:
                mul, add = fold(name, d_out)
                return jnp.maximum(y * mul + add, 0)
            yn, ns = _packed_bn_train(
                y, p[name]["Norm_0"]["BatchNorm_0"],
                bs[name]["Norm_0"]["BatchNorm_0"], d_out, dt, self.axis_name)
            new_stats[name] = {"Norm_0": {"BatchNorm_0": ns}}
            return yn

        def conv(xx, name, d_in, sd, s2):
            k2 = pk.pack_conv3d_kernel(
                p[name]["Conv_0"]["kernel"].astype(dt), d_in, sd=sd, pd=1)
            d_out = (d_in + 2 - 3) // sd + 1
            y = jax.lax.conv_general_dilated(
                xx, k2, (s2, s2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return norm_act(y, name, d_out), d_out

        def deconv(xx, name, d_in):
            # torch ConvTranspose3d(k3, s2, p1, op=1): flax pad (1, 2)/axis.
            k2 = pk.pack_deconv3d_kernel(
                p[name]["ConvTranspose_0"]["kernel"].astype(dt),
                d_in, sd=2, lo=1, hi=2)
            y = jax.lax.conv_transpose(
                xx, k2, (2, 2), ((1, 2), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return norm_act(y, name, 2 * d_in)

        y, d1 = conv(xp, "conv1", D, 2, 2)
        c2, _ = conv(y, "conv2", d1, 1, 1)
        y, d2 = conv(c2, "conv3", d1, 2, 2)
        c4, _ = conv(y, "conv4", d2, 1, 1)
        y, d3 = conv(c4, "conv5", d2, 2, 2)
        bott, _ = conv(y, "conv6", d3, 1, 1)
        up = c4 + deconv(bott, "conv7", d3)
        up = c2 + deconv(up, "conv9", d2)
        if C != c:
            ki = pk.pack_conv3d_kernel(
                p["inner"]["kernel"].astype(dt), D, sd=1, pd=0)
            inner = xp @ ki[0, 0] + jnp.tile(p["inner"]["bias"], D).astype(dt)
        else:
            inner = xp
        up = inner + deconv(up, "conv11", d1)
        if self.last_layer:
            kp = pk.pack_conv3d_kernel(
                p["prob"]["kernel"].astype(dt), D, sd=1, pd=1)
            up = jax.lax.conv_general_dilated(
                up, kp, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if training and new_stats:
            for name, tree in new_stats.items():
                self.put_variable("batch_stats", name, tree)
        return pk.unpack_volume(up, D)

    @nn.compact
    def __call__(self, x, training: bool = False):
        if (self.norm == "BN" and x.shape[1] % 8 == 0
                and (not training or self.packed_train)
                and not self.is_initializing()):
            return self._packed(x, training)
        c = self.base_ch
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        conv0 = x
        conv2 = Conv3dNormAct(c * 2, **kw, name="conv2")(
            Conv3dNormAct(c * 2, stride=2, **kw, name="conv1")(conv0, training), training)
        conv4 = Conv3dNormAct(c * 4, **kw, name="conv4")(
            Conv3dNormAct(c * 4, stride=2, **kw, name="conv3")(conv2, training), training)
        bott = Conv3dNormAct(c * 8, **kw, name="conv6")(
            Conv3dNormAct(c * 8, stride=2, **kw, name="conv5")(conv4, training), training)
        up = conv4 + Deconv3dNormAct(c * 4, stride=2, **kw, name="conv7")(bott, training)
        up = conv2 + Deconv3dNormAct(c * 2, stride=2, **kw, name="conv9")(up, training)
        inner = (
            nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="inner")(conv0)
            if conv0.shape[-1] != c else conv0
        )
        up = inner + Deconv3dNormAct(c, stride=2, **kw, name="conv11")(up, training)
        if self.last_layer:
            # SmallConv: the 8->1 head is the tiny-C_out layout pathology's
            # worst case (see ops/smallconv.py) — matmul+shift-add instead.
            up = SmallConv(1, (3, 3, 3), use_bias=False,
                           dtype=self.dtype, name="prob")(up)
        return up


class CostRegNet3D(nn.Module):
    """Spatial-stride-only 3D U-Net (keeps the full depth axis)."""

    base_ch: int = 8
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None
    packed_train: bool = False

    def _packed(self, x, training=False):
        """Depth-packed forward: every 3D conv/deconv as a 2D conv over
        [B, H, W, D*C] (see ops/packed3d.py — the tiny-channel 3D convs cost
        ~25 ms/frame at the eval shape; their channel-minor backward fusions
        dominate the round-5 train trace). Exact; reads the SAME param tree
        the flax path declares. training=True keeps real BatchNorm semantics
        via _packed_bn_train."""
        import jax

        from mvsformer_tpu.ops import packed3d as pk

        B, D, H, W, C = x.shape
        c = self.base_ch
        p = self.variables["params"]
        bs = self.variables.get("batch_stats", {})
        dt = self.dtype
        new_stats = {}
        xp = pk.pack_volume(x).astype(dt)

        def fold(name, d_out):
            bn_p = p[name]["Norm_0"]["BatchNorm_0"]
            bn_s = bs[name]["Norm_0"]["BatchNorm_0"]
            inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + 1e-5)
            mul = bn_p["scale"].astype(jnp.float32) * inv
            add = (bn_p["bias"].astype(jnp.float32)
                   - bn_s["mean"].astype(jnp.float32) * mul)
            return jnp.tile(mul, d_out).astype(dt), \
                jnp.tile(add, d_out).astype(dt)

        def norm_act(y, name):
            if not training:
                mul, add = fold(name, D)
                return jnp.maximum(y * mul + add, 0)
            yn, ns = _packed_bn_train(
                y, p[name]["Norm_0"]["BatchNorm_0"],
                bs[name]["Norm_0"]["BatchNorm_0"], D, dt, self.axis_name)
            new_stats[name] = {"Norm_0": {"BatchNorm_0": ns}}
            return yn

        def conv(xx, name, stride):
            k2 = pk.pack_conv3d_kernel(
                p[name]["Conv_0"]["kernel"].astype(dt), D, sd=1, pd=1)
            y = jax.lax.conv_general_dilated(
                xx, k2, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return norm_act(y, name)

        def deconv(xx, name):
            k2 = pk.pack_deconv3d_kernel(
                p[name]["ConvTranspose_0"]["kernel"].astype(dt),
                D, sd=1, lo=1, hi=1)
            y = jax.lax.conv_transpose(
                xx, k2, (2, 2), ((1, 2), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return norm_act(y, name)

        c2 = conv(conv(xp, "conv1", 2), "conv2", 1)
        c4 = conv(conv(c2, "conv3", 2), "conv4", 1)
        bott = conv(conv(c4, "conv5", 2), "conv6", 1)
        up = c4 + deconv(bott, "conv7")
        up = c2 + deconv(up, "conv9")
        if C != c:
            ki = pk.pack_conv3d_kernel(
                p["inner"]["kernel"].astype(dt), D, sd=1, pd=0)
            inner = xp @ ki[0, 0] + jnp.tile(p["inner"]["bias"], D).astype(dt)
        else:
            inner = xp
        up = inner + deconv(up, "conv11")
        kp = pk.pack_conv3d_kernel(
            p["prob"]["kernel"].astype(dt), D, sd=1, pd=0)
        prob = up @ kp[0, 0] + jnp.tile(p["prob"]["bias"], D).astype(dt)
        if training and new_stats:
            for name, tree in new_stats.items():
                self.put_variable("batch_stats", name, tree)
        return pk.unpack_volume(prob, D)  # [B, D, H, W, 1]

    @nn.compact
    def __call__(self, x, training: bool = False):
        if (self.norm == "BN" and (not training or self.packed_train)
                and not self.is_initializing()):
            return self._packed(x, training)
        c = self.base_ch
        s = (1, 2, 2)
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        conv0 = x
        conv2 = Conv3dNormAct(c * 2, **kw, name="conv2")(
            Conv3dNormAct(c * 2, stride=s, **kw, name="conv1")(conv0, training), training)
        conv4 = Conv3dNormAct(c * 4, **kw, name="conv4")(
            Conv3dNormAct(c * 4, stride=s, **kw, name="conv3")(conv2, training), training)
        bott = Conv3dNormAct(c * 8, **kw, name="conv6")(
            Conv3dNormAct(c * 8, stride=s, **kw, name="conv5")(conv4, training), training)
        up = conv4 + Deconv3dNormAct(c * 4, stride=s, **kw, name="conv7")(bott, training)
        up = conv2 + Deconv3dNormAct(c * 2, stride=s, **kw, name="conv9")(up, training)
        inner = (
            nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="inner")(conv0)
            if conv0.shape[-1] != c else conv0
        )
        up = inner + Deconv3dNormAct(c, stride=s, **kw, name="conv11")(up, training)
        return SmallConv(1, (1, 1, 1), dtype=self.dtype, name="prob")(up)


class CostRegNet2D(nn.Module):
    """(1,3,3)-kernel variant: pure-2D regularization in disguise (epipole mode)."""

    base_ch: int = 8
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.base_ch
        k = (1, 3, 3)
        s = (1, 2, 2)
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        conv0 = x
        conv2 = Conv3dNormAct(c * 2, **kw, name="conv2")(
            Conv3dNormAct(c * 2, kernel=k, stride=s, **kw, name="conv1")(conv0, training), training)
        conv4 = Conv3dNormAct(c * 4, **kw, name="conv4")(
            Conv3dNormAct(c * 4, kernel=k, stride=s, **kw, name="conv3")(conv2, training), training)
        bott = Conv3dNormAct(c * 8, **kw, name="conv6")(
            Conv3dNormAct(c * 8, kernel=k, stride=s, **kw, name="conv5")(conv4, training), training)

        def up2d(feat, ch, name):
            return _Deconv2dIn3d(ch, norm=self.norm, dtype=self.dtype,
                                 axis_name=self.axis_name, name=name)(feat, training)

        up = conv4 + up2d(bott, c * 4, "conv7")
        up = conv2 + up2d(up, c * 2, "conv9")
        up = conv0 + up2d(up, c, "conv11")
        return SmallConv(1, (1, 1, 1), dtype=self.dtype, name="prob")(up)


class _Deconv2dIn3d(nn.Module):
    """ConvTranspose3d with (1,3,3) kernel and (1,2,2) stride + BN + ReLU."""

    features: int
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        from mvsformer_tpu.models.blocks import Norm, torch_deconv

        # torch ConvTranspose3d(k=(1,3,3), s=(1,2,2), p=(0,1,1), op=(0,1,1))
        # alignment (module.py:521-531): flax pad = (k-1-p, k-1-p+op).
        x = torch_deconv(x, self.features, (1, 3, 3), (1, 2, 2),
                         ((0, 0), (1, 2), (1, 2)), dtype=self.dtype)
        x = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name)(x, training)
        return nn.relu(x)
