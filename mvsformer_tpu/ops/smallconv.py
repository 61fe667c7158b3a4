"""Tiny-channel convolutions as matmul + shift-add.

Why this exists: XLA's TPU convolution emitter picks channel-minor
T(2,128)/T(8,128) layouts, so a conv whose output has 1..32 channels uses
1/128..32/128 of each vector register and runs at single-digit GB/s. The
cascade is full of exactly these convs — the cost-regularization `prob` head
(8->1), the visibility CNN's final 1x1 (8->1), the FPN out blocks (64->8/16/32)
— and a round-2 profile showed them consuming ~35% of the eval frame at
2-50 GB/s effective bandwidth (docs/DESIGN.md, round-2 attribution table).

The reformulation: a stride-1 SAME conv with T = prod(kernel) taps is

    y[p, o] = sum_t  (x @ K_t)[p + t - c, o]          (K_t = kernel[t] as 1x1)

i.e. ONE matmul x[..., Cin] @ K2[Cin, T*Cout] (all taps at once, lane-friendly
N = T*Cout instead of N = Cout), then T shifted slice-adds that XLA fuses into
a single streaming loop fusion. Every tensor keeps the spatial W dimension
minor, so the downstream softmax/argmax/regression reductions inherit sane
layouts too (the size-1-minor conv output used to poison the whole stage
tail). Functional spec of the consumers: reference models/module.py:558-560
(prob head), mvsformer_model.py:37 (vis conv), module.py:208-302 (FPN outs).

Equal-FLOPs, pure JAX, exact (same accumulation dtype as nn.Conv); autodiff
gives the usual matmul/scatter adjoints so it is used in training as well.
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def small_conv(x, kernel, bias=None):
    """Stride-1 SAME n-D conv via per-tap matmul + shift-add.

    x: [B, *spatial, Cin]; kernel: [*ks, Cin, Cout]; bias: [Cout] or None.
    Odd kernel sizes only (1/3/5/...); returns [B, *spatial, Cout].
    """
    *ks, cin, cout = kernel.shape
    assert x.shape[-1] == cin, (x.shape, kernel.shape)
    taps = math.prod(ks)
    k2 = kernel.reshape(taps, cin, cout)
    k2 = jnp.moveaxis(k2, 1, 0).reshape(cin, taps * cout)
    z = x @ k2  # [B, *S, taps*cout] — one MXU matmul for all taps
    if taps == 1:
        out = z
    else:
        spatial = x.shape[1:-1]
        z = z.reshape(x.shape[:-1] + (taps, cout))
        pad = ([(0, 0)] + [(k // 2, k // 2) for k in ks] + [(0, 0), (0, 0)])
        zp = jnp.pad(z, pad)
        out = None
        for t, offs in enumerate(itertools.product(*[range(k) for k in ks])):
            sl = ((slice(None),)
                  + tuple(slice(o, o + s) for o, s in zip(offs, spatial))
                  + (t,))
            term = zp[sl]
            out = term if out is None else out + term
    if bias is not None:
        out = out + bias
    return out


class SmallConv(nn.Module):
    """Drop-in for stride-1 SAME `nn.Conv` with a tiny channel count.

    Parameter tree (names, shapes, inits) is IDENTICAL to nn.Conv — kernel
    [*ks, Cin, Cout] (lecun_normal), bias [Cout] (zeros) — so checkpoints and
    the torch-weight converter are unaffected by the compute reformulation.
    """

    features: int
    kernel_size: Sequence[int]
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            ks + (x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        return small_conv(x, kernel, bias)
