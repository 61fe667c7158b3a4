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


class CostRegNet(nn.Module):
    """Full 3D U-Net, stride 2 in (D, H, W)."""

    base_ch: int = 8
    last_layer: bool = True
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
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

    @nn.compact
    def __call__(self, x, training: bool = False):
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
