"""Depth-packed 3D convolutions: run NDHWC conv3d as NHWC conv2d.

Why: the cost-regularization U-Nets (models/costreg.py; reference
models/module.py:469-594) convolve [B, D, H, W, C] volumes with C = 8..64.
XLA's TPU conv emitter gives those tiny-channel 3D convs channel-minor
layouts at 10-50 GB/s (round-2 profile: ~25 ms/frame in stage-3/4 cost-reg
convs alone). Folding the small depth axis into channels turns every layer
into a 2D conv with D*C = 32..512 channels — shapes the emitter is actually
fast at.

The depth-axis taps become block-banded structure in the packed kernel:

  conv3d:   y[do] = sum_dd x[sd*do + dd - pd] K[dd]   =>
  K2[(di,ci),(do,co)] = K[di - sd*do + pd, kh, kw, ci, co]  (0 outside)

  deconv3d (flax explicit padding, input dilated by sd):
  K2[(di,ci),(do,co)] = K[sd*di - do + lo, kh, kw, ci, co]  (0 outside)

The packed matmul does dense (D*C)x(D*C') work where the band is ~kd/D
sparse — extra MXU FLOPs, but these layers are bandwidth-bound and the MXU
has headroom. Exact (a reindexing, not an approximation); kernels are
transformed from the ORIGINAL 3D parameters at trace time, so checkpoints
and the torch converter are untouched.
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_conv3d_kernel(k, d_in, sd=1, pd=1):
    """[kd,kh,kw,Cin,Cout] -> [kh,kw,d_in*Cin,d_out*Cout] for stride sd."""
    kd, kh, kw, cin, cout = k.shape
    d_out = (d_in + 2 * pd - kd) // sd + 1
    di = jnp.arange(d_in)[:, None]
    do = jnp.arange(d_out)[None, :]
    dd = di - sd * do + pd                       # [d_in, d_out]
    valid = (dd >= 0) & (dd < kd)
    kt = k[jnp.clip(dd, 0, kd - 1)]              # [d_in,d_out,kh,kw,Cin,Cout]
    kt = jnp.where(valid[..., None, None, None, None], kt, 0.0)
    kt = kt.transpose(2, 3, 0, 4, 1, 5)          # [kh,kw,d_in,Cin,d_out,Cout]
    return kt.reshape(kh, kw, d_in * cin, d_out * cout)


def pack_deconv3d_kernel(k, d_in, sd, lo, hi):
    """[kd,kh,kw,Cin,Cout] -> [kh,kw,d_in*Cin,d_out*Cout], transposed-conv
    depth axis with flax explicit padding (lo, hi)."""
    kd, kh, kw, cin, cout = k.shape
    d_out = (d_in - 1) * sd + 1 + lo + hi - (kd - 1)
    di = jnp.arange(d_in)[:, None]
    do = jnp.arange(d_out)[None, :]
    dd = sd * di - do + lo                       # [d_in, d_out]
    valid = (dd >= 0) & (dd < kd)
    kt = k[jnp.clip(dd, 0, kd - 1)]
    kt = jnp.where(valid[..., None, None, None, None], kt, 0.0)
    kt = kt.transpose(2, 3, 0, 4, 1, 5)
    return kt.reshape(kh, kw, d_in * cin, d_out * cout)


def pack_volume(x):
    """[B, D, H, W, C] -> [B, H, W, D*C]."""
    b, d, h, w, c = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)


def unpack_volume(x, d):
    """[B, H, W, D*C] -> [B, D, H, W, C]."""
    b, h, w, dc = x.shape
    return x.reshape(b, h, w, d, dc // d).transpose(0, 3, 1, 2, 4)
