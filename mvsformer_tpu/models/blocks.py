"""Basic conv/norm/activation building blocks (Flax linen, NHWC/NDHWC).

Functional spec: /root/reference/models/module.py:41-205 (Conv2d with IN/BN +
leaky-ReLU, Conv3d/Deconv3d with BN+ReLU, ConvBnReLU, Swish). TPU-first
choices: channels-last layouts everywhere, a `dtype` compute policy (bf16 by
default with fp32 params), and a `norm` knob that can swap BatchNorm for
GroupNorm (no cross-replica stat traffic — SURVEY.md section 7 hard-parts).

BatchNorm stats are synchronized across the `axis_name` passed by the training
step (the TPU equivalent of SyncBatchNorm, train.py:138) when one is supplied.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvsformer_tpu.ops.smallconv import (
    SMALL_CH_MAX, SmallConv, SmallConvTranspose)

Dtype = Any


def _torch_pad(kernel):
    """Symmetric per-axis padding matching torch's p=(k-1)//2 convention.
    Identical to SAME for stride 1, but torch-aligned (not XLA-SAME) for
    strided convs — required for reference-checkpoint parity."""
    return tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel)


# Which tiny-channel conv classes route through the matmul+shift-add path
# ("s1" = stride-1 convs, "strided" = downsampling convs, "deconv" =
# transposed convs). Source of truth: ModelConfig.smallconv_modes /
# .smallconv_s1cap, applied via configure_smallconv() at build_model time; a
# SET MVSTPU_SMALLCONV / MVSTPU_SMALLCONV_S1CAP env var wins (ad-hoc bench
# sweeps, docs/DESIGN.md round-2 ledger). Module-level because torch_conv is
# a free function used by every conv block — set it BEFORE tracing; models
# built earlier keep whatever routing they were traced with.
_SMALLCONV_MODES = frozenset("s1,deconv".split(","))
_S1_CAP = 144


def configure_smallconv(modes: str = "s1,deconv", s1cap: int = 144) -> None:
    """Apply ModelConfig's SmallConv routing knobs (env override wins)."""
    global _SMALLCONV_MODES, _S1_CAP
    env_modes = os.environ.get("MVSTPU_SMALLCONV")
    env_cap = os.environ.get("MVSTPU_SMALLCONV_S1CAP")
    _SMALLCONV_MODES = frozenset(
        (env_modes if env_modes is not None else modes).split(","))
    _S1_CAP = int(env_cap) if env_cap is not None else int(s1cap)


configure_smallconv()


def torch_conv(x, features, kernel, stride, use_bias, dtype, name="Conv_0"):
    """Torch-padded conv; routes tiny-C_out cases through the matmul+shift-add
    SmallConv (see ops/smallconv.py — XLA's TPU conv emitter picks channel-
    minor layouts that run at single-digit GB/s below ~32 channels). The two
    paths have IDENTICAL parameter trees, so the routing is checkpoint- and
    converter-transparent."""
    k = tuple(kernel)
    s = (stride,) * len(k) if isinstance(stride, int) else tuple(stride)
    mode = "s1" if all(si == 1 for si in s) else "strided"
    # Stride-1 cap: the all-taps matmul materializes taps*features channels;
    # beyond the cap the extra z traffic exceeds what the layout fix saves
    # (measured: blanket s1 routing of 16/32-ch 27-tap 3D convs — taps*f =
    # 432/864 — regressed the eval frame 2.51 -> 1.61 dm/s).
    taps = 1
    for kk in k:
        taps *= kk
    small_ok = (features <= SMALL_CH_MAX
                and (mode != "s1" or taps * features <= _S1_CAP))
    if small_ok and mode in _SMALLCONV_MODES:
        return SmallConv(features, k, strides=s, use_bias=use_bias,
                         dtype=dtype, name=name)(x)
    # Stride-1 tiny-C 2D convs the matmul path rejects (taps*f over the cap:
    # conv00 7x7 3->8, conv01 5x5 8->8 at full res) go through the exact
    # space-to-depth phase conv instead (ops/smallconv.py small_conv_s2d) —
    # 4x the channels at 1/2 res keeps XLA's conv emitter lane-efficient.
    if (mode == "s1" and "s2d" in _SMALLCONV_MODES and len(k) == 2
            and features <= SMALL_CH_MAX and all(kk % 2 == 1 for kk in k)
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        return SmallConv(features, k, strides=s, use_bias=use_bias,
                         dtype=dtype, phase_s2d=True, name=name)(x)
    return nn.Conv(features, k, strides=s, padding=_torch_pad(k),
                   use_bias=use_bias, dtype=dtype, name=name)(x)


def torch_deconv(x, features, kernel, stride, padding, dtype,
                 name="ConvTranspose_0"):
    """Explicit-padding transposed conv with the same tiny-C_out routing."""
    k = tuple(kernel)
    s = (stride,) * len(k) if isinstance(stride, int) else tuple(stride)
    if features <= SMALL_CH_MAX and "deconv" in _SMALLCONV_MODES:
        return SmallConvTranspose(features, k, strides=s, padding=padding,
                                  use_bias=False, dtype=dtype, name=name)(x)
    return nn.ConvTranspose(features, k, strides=s, padding=padding,
                            use_bias=False, dtype=dtype, name=name)(x)


class MatmulConv1x1(nn.Module):
    """1x1 conv as an explicit matmul.

    nn.Conv(1x1) lowers through XLA's conv emitter, which picks W-tiled
    layouts + full-res layout copies on big NHWC tensors (the FPN lateral
    1x1s cost ~8 ms/frame that way; swapping to x @ kernel measured
    3.77 -> 4.23 dm/s). Param tree identical to nn.Conv."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        return x @ kernel[0, 0] + bias


def swish(x):
    return x * nn.sigmoid(x)


class _FoldedBN(nn.Module):
    """Inference BatchNorm as one per-channel compute-dtype affine.

    y = x * (scale * rsqrt(var + eps)) + (bias - mean * scale * rsqrt(...)),
    with the fold computed in f32 on the [C] vectors only. Declares the SAME
    variables as nn.BatchNorm (params scale/bias, batch_stats mean/var), so
    train-time nn.BatchNorm checkpoints load transparently.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((feat,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((feat,), jnp.float32)).value
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon)
        mul = scale.astype(jnp.float32) * inv
        add = bias.astype(jnp.float32) - mean.astype(jnp.float32) * mul
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class Norm(nn.Module):
    """Normalization dispatcher: 'BN' | 'IN' | 'GN' | 'none'."""

    kind: str = "BN"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.kind == "BN":
            if not training:
                # Eval fast path: fold the running stats into one per-channel
                # affine, computed in f32 on the TINY [C] vectors and applied
                # in the compute dtype. flax's BatchNorm promotes the whole
                # activation to f32 here (normalization.py promote_dtype) —
                # profiled at ~12 ms/frame of f32 layout copies on the
                # stage-4 cost volume alone. _FoldedBN's variable tree is
                # identical to nn.BatchNorm's, so checkpoints are unaffected.
                return _FoldedBN(name="BatchNorm_0")(x)
            return nn.BatchNorm(
                use_running_average=False,
                momentum=self.momentum,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name="BatchNorm_0",
            )(x)
        if self.kind == "GN":
            groups = min(8, x.shape[-1])
            while x.shape[-1] % groups:
                groups -= 1
            return nn.GroupNorm(num_groups=groups, dtype=self.dtype)(x)
        if self.kind == "IN":
            # Instance norm == GroupNorm with one group per channel, no stats.
            return nn.GroupNorm(num_groups=x.shape[-1], dtype=self.dtype)(x)
        return x


class ConvNormAct(nn.Module):
    """2D conv + norm + leaky-ReLU(0.1) (module.py Conv2d)."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "BN"
    act: bool = True
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = torch_conv(x, self.features, (self.kernel, self.kernel),
                       self.stride, use_bias=(self.norm == "none"),
                       dtype=self.dtype)
        x = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name)(x, training)
        if self.act:
            x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class ConvBnReLU(nn.Module):
    """2D conv + BN + ReLU (module.py:168-197); used by the visibility CNN."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = torch_conv(x, self.features, (self.kernel, self.kernel),
                       self.stride, use_bias=False, dtype=self.dtype)
        x = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name)(x, training)
        return nn.relu(x)


class Conv3dNormAct(nn.Module):
    """3D conv + BN + ReLU over NDHWC volumes (module.py Conv3d)."""

    features: int
    kernel: Sequence[int] | int = 3
    stride: Sequence[int] | int = 1
    norm: str = "BN"
    act: bool = True
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        k = (self.kernel,) * 3 if isinstance(self.kernel, int) else tuple(self.kernel)
        s = (self.stride,) * 3 if isinstance(self.stride, int) else tuple(self.stride)
        x = torch_conv(x, self.features, k, s,
                       use_bias=(self.norm == "none"), dtype=self.dtype)
        x = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name)(x, training)
        if self.act:
            x = nn.relu(x)
        return x


class Deconv3dNormAct(nn.Module):
    """Transposed 3D conv + BN + ReLU; exact 2x upsampling on strided axes
    (module.py Deconv3d with kernel 3, stride (1,2,2) or 2, output_padding 1)."""

    features: int
    stride: Sequence[int] | int = 2
    norm: str = "BN"
    act: bool = True
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        s = (self.stride,) * 3 if isinstance(self.stride, int) else tuple(self.stride)
        # torch ConvTranspose3d(k3, p1, output_padding=s-1) alignment:
        # flax pad (lo,hi) = (k-1-p, k-1-p+op) = (1, s) per axis.
        x = torch_deconv(x, self.features, (3, 3, 3), s,
                         tuple((1, si) for si in s), dtype=self.dtype)
        x = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name)(x, training)
        if self.act:
            x = nn.relu(x)
        return x


class Deconv2dNormAct(nn.Module):
    """Transposed 2D conv (kernel 4, stride 2 => exact 2x) + norm + activation."""

    features: int
    norm: str = "BN"
    act: Callable | None = nn.gelu
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False):
        # torch ConvTranspose2d(k4, s2, p1): flax pad (k-1-p,)*2 = (2, 2).
        x = torch_deconv(x, self.features, (4, 4), (2, 2),
                         ((2, 2), (2, 2)), dtype=self.dtype)
        x = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name)(x, training)
        if self.act is not None:
            x = self.act(x)
        return x
