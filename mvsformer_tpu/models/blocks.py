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

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _torch_pad(kernel):
    """Symmetric per-axis padding matching torch's p=(k-1)//2 convention.
    Identical to SAME for stride 1, but torch-aligned (not XLA-SAME) for
    strided convs — required for reference-checkpoint parity."""
    return tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel)


def swish(x):
    return x * nn.sigmoid(x)


class Norm(nn.Module):
    """Normalization dispatcher: 'BN' | 'IN' | 'GN' | 'none'."""

    kind: str = "BN"
    dtype: Dtype = jnp.float32
    axis_name: str | None = None
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.kind == "BN":
            return nn.BatchNorm(
                use_running_average=not training,
                momentum=self.momentum,
                dtype=self.dtype,
                axis_name=self.axis_name if training else None,
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
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.stride,
            padding=_torch_pad((self.kernel, self.kernel)),
            use_bias=(self.norm == "none"), dtype=self.dtype,
        )(x)
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
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.stride,
            padding=_torch_pad((self.kernel, self.kernel)),
            use_bias=False, dtype=self.dtype,
        )(x)
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
        x = nn.Conv(
            self.features, k, strides=s, padding=_torch_pad(k),
            use_bias=(self.norm == "none"), dtype=self.dtype,
        )(x)
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
        x = nn.ConvTranspose(
            self.features, (3, 3, 3), strides=s,
            padding=tuple((1, si) for si in s),
            use_bias=False, dtype=self.dtype,
        )(x)
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
        x = nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            use_bias=False, dtype=self.dtype,
        )(x)
        x = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name)(x, training)
        if self.act is not None:
            x = self.act(x)
        return x
