"""ViT-to-FPN decoder heads.

Functional spec: /root/reference/models/module.py:305-466 — TwinDecoderStage4
(FPN over the Twins pyramid -> one 1/8-res map), TwinDecoderStage4V2 (adds
1/4 and 1/2 outputs for the multi-scale model), VITDecoderStage4* (DINO
variant decoders with CLS-attention gating) and AttentionFusionSimple.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mvsformer_tpu.models.blocks import MatmulConv1x1, Deconv2dNormAct, Norm, swish
from mvsformer_tpu.ops.resize import resize_bilinear

Dtype = Any


class _ConvNorm(nn.Module):
    features: int
    kernel: int = 3
    act: str = "relu"  # relu | gelu | swish
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                    dtype=self.dtype)(x)
        x = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name)(x, training)
        if self.act == "relu":
            return nn.relu(x)
        if self.act == "gelu":
            return nn.gelu(x)
        return swish(x)


def _up2(x):
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                           spatial_axes=(1, 2), align_corners=False)


class TwinDecoderStage4(nn.Module):
    """Twins pyramid [1/8..1/64 of the 0.5x ViT input] -> one 1/8-res map
    (module.py:389-413)."""

    out_ch: int = 64
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x1, x2, x3, x4, training: bool = False):
        ch = self.out_ch * 4
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        x = Deconv2dNormAct(ch, **kw, act=nn.gelu, name="upsampler0")(x4, training)
        x = x + MatmulConv1x1(ch, dtype=self.dtype, name="inner1")(x3)
        x = _ConvNorm(ch // 2, act="relu", **kw, name="smooth1")(x, training)
        x = _up2(x) + MatmulConv1x1(ch // 2, dtype=self.dtype, name="inner2")(x2)
        x = _ConvNorm(ch // 4, act="relu", **kw, name="smooth2")(x, training)
        x = _up2(x) + MatmulConv1x1(ch // 4, dtype=self.dtype, name="inner3")(x1)
        x = _ConvNorm(ch // 4, act="swish", **kw, name="smooth3")(x, training)
        return x


class TwinDecoderStage4V2(nn.Module):
    """Multi-scale variant: returns 1/8, 1/4, 1/2-res maps (module.py:416-447)."""

    out_ch: int = 64
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x1, x2, x3, x4, training: bool = False):
        ch = self.out_ch * 4
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        x = Deconv2dNormAct(ch, **kw, act=nn.gelu, name="upsampler0")(x4, training)
        x = x + MatmulConv1x1(ch, dtype=self.dtype, name="inner1")(x3)
        x = _ConvNorm(ch // 2, act="gelu", **kw, name="smooth1")(x, training)
        x = _up2(x) + MatmulConv1x1(ch // 2, dtype=self.dtype, name="inner2")(x2)
        x = _ConvNorm(ch // 4, act="gelu", **kw, name="smooth2")(x, training)
        x = _up2(x) + MatmulConv1x1(ch // 4, dtype=self.dtype, name="inner3")(x1)
        out1 = _ConvNorm(ch // 4, act="gelu", **kw, name="smooth3")(x, training)
        out2 = Deconv2dNormAct(ch // 8, **kw, act=nn.gelu, name="decoder1")(out1, training)
        out3 = Deconv2dNormAct(ch // 16, **kw, act=nn.gelu, name="decoder2")(out2, training)
        return out1, out2, out3


class AttentionFusionSimple(nn.Module):
    """CLS-attention gating of DINO features (module.py:450-466)."""

    vit_ch: int
    out_ch: int
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, att, training: bool = False):
        # x: [B, h, w, C]; att: [B, h, w, nhead]
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        x1 = _ConvNorm(self.vit_ch, act="swish", **kw, name="conv_l")(
            jnp.concatenate([x, att], axis=-1), training)
        att_mean = att.mean(axis=-1, keepdims=True)
        x2 = _ConvNorm(self.vit_ch, act="swish", **kw, name="conv_r")(x * att_mean, training)
        return MatmulConv1x1(self.out_ch, dtype=self.dtype, name="proj")(x1 * x2)


class VITDecoderStage4Single(nn.Module):
    """DINO decoder -> single 1/8-res map (module.py:353-368)."""

    out_ch: int = 64
    vit_ch: int = 384
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, att, training: bool = False):
        ch = self.out_ch
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        x = AttentionFusionSimple(self.vit_ch, ch * 4, **kw, name="attn")(x, att, training)
        x = Deconv2dNormAct(ch * 2, **kw, act=nn.gelu, name="deconv1")(x, training)
        x = Deconv2dNormAct(ch, **kw, act=nn.gelu, name="deconv2")(x, training)
        return x


class VITDecoderStage4(nn.Module):
    """DINO multi-scale decoder -> 1/8, 1/4, 1/2-res maps (module.py:305-350,
    sequential non-multi_scale_decoder path)."""

    out_ch: int = 64
    vit_ch: int = 384
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, att, training: bool = False):
        ch = self.out_ch
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        x = AttentionFusionSimple(self.vit_ch, ch * 4, **kw, name="attn")(x, att, training)
        h = Deconv2dNormAct(ch * 2, **kw, act=nn.gelu, name="decoder1a")(x, training)
        out1 = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                dtype=self.dtype, name="decoder1b")(h)
        h2 = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name, name="bn2")(out1, training)
        out2 = nn.ConvTranspose(ch // 2, (4, 4), strides=(2, 2), padding="SAME",
                                dtype=self.dtype, name="decoder2")(nn.gelu(h2))
        h3 = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name, name="bn3")(out2, training)
        out3 = nn.ConvTranspose(ch // 4, (4, 4), strides=(2, 2), padding="SAME",
                                dtype=self.dtype, name="decoder3")(nn.gelu(h3))
        return out1, out2, out3


class VITDecoderStage4NoAtt(nn.Module):
    """No-attention DINO decoder (module.py:371-386)."""

    out_ch: int = 64
    vit_ch: int = 384
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, att=None, training: bool = False):
        ch = self.out_ch
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        x = _ConvNorm(ch * 4, act="gelu", **kw, name="down_sample")(x, training)
        x = Deconv2dNormAct(ch * 2, **kw, act=nn.gelu, name="deconv1")(x, training)
        x = Deconv2dNormAct(ch, **kw, act=nn.gelu, name="deconv2")(x, training)
        return x
