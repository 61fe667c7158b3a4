"""Collapsed final FPN level: Conv3x3(up2(intra) + Conv1x1(lateral)) without
materializing the final-channel full-resolution intra tensor.

Functional spec: reference models/module.py:259-268 (FPNDecoder —
`F.interpolate(intra, scale_factor=2, align_corners=True) + inner3(conv01)`
followed by `out3` = Conv3x3 + BN + Swish). The TPU profile attributes the
largest single slice of eval device time to exactly this level: the 64-ch
full-res intra tensor is produced by a dense-matmul 2x resize, relayout-copied
twice (227 MB each), tap-expanded to 9x8 channels at full res (1.27 GB), and
then thrown away — the LAST level's intra is the only one never consumed
downstream.

By linearity the out3 conv is pushed through both addends:

* through the resize: Conv3x3(up2(x)) = sum over the 9 taps (ty, tx) of
  ((S_ty R_h) x W_{ty,tx} (S_tx R_w)^T) where R_h/R_w are the [out, in]
  align_corners tent matrices and S_d shifts matrix ROWS by d with zero fill
  — a zero row reproduces the conv's zero padding at the full-res border
  exactly. The tap-weight matmul runs at HALF resolution (C -> 9*Co, e.g.
  64 -> 72 channels), and the dense resizes then act on Co=8 channels instead
  of 64: ~8x fewer resize MACs and ~2x less HBM traffic for the level, with
  no full-res 64-ch tensor and no relayout copies.
* through the 1x1 lateral: the kernels compose into one [3,3,Cl,Co] conv
  (done in f32 on the tiny weight tensors), evaluated with the stock
  small_conv matmul+shift-add. The 1x1's bias constant does NOT commute with
  the conv's zero padding; its exact contribution is the separable border
  field sum_{ty,tx} vy[i,ty] vx[j,tx] (W_{ty,tx} . b1) with vy/vx the tap
  validity masks — rank-9, fused by XLA into the final add.

The reformulation is exact linear algebra (valid for training too; the Norm
that follows sees the identical pre-activation), keeps the parameter tree
byte-identical (it reads the stock inner3/out3 params), and is routed from
FPNDecoder behind ModelConfig.fpn_collapse.
"""

from __future__ import annotations

import jax.numpy as jnp

from mvsformer_tpu.ops.resize import _bilinear_matrix
from mvsformer_tpu.ops.smallconv import small_conv, small_conv_s2d


def _shifted_resize_matrices(n_in: int, n_out: int, taps: int, dtype):
    """Stack of row-shifted align_corners tent matrices [taps, n_out, n_in].

    Entry t applies the resize then a shift by (t - taps//2) output rows,
    with zero rows where the shift leaves the output range — matching the
    downstream conv's zero padding.
    """
    r = _bilinear_matrix(n_in, n_out, align_corners=True)
    p = taps // 2
    rp = jnp.pad(r, ((p, p), (0, 0)))
    return jnp.stack([rp[t:t + n_out] for t in range(taps)]).astype(dtype)


def _tap_validity(n: int, taps: int):
    """[n, taps] mask: tap t at position i reads i + t - taps//2 in range."""
    i = jnp.arange(n)[:, None]
    t = jnp.arange(taps)[None, :]
    src = i + t - taps // 2
    return ((src >= 0) & (src < n)).astype(jnp.float32)


def collapsed_final_level(x, lateral, k1, b1, k3, b3):
    """Pre-norm output of the final FPN level, exactly.

    x:       [N, h, w, C]   half-res intra tensor (level above)
    lateral: [N, 2h, 2w, I] full-res encoder feature (conv01)
    k1/b1:   inner 1x1 conv params [1, 1, I, C] / [C]
    k3/b3:   out 3x3 conv params [kh, kw, C, O] / [O]
    returns  [N, 2h, 2w, O] == Conv3x3(up2(x) + Conv1x1(lateral)) + b3.
    """
    n, h, w, c = x.shape
    kh, kw, _, o = k3.shape
    hh, ww = 2 * h, 2 * w
    dt = x.dtype

    # Path A: conv-through-resize. Tap matmul at half res, then shifted-tent
    # resizes on the o-channel tensors.
    k3m = jnp.moveaxis(k3, 2, 0).reshape(c, kh * kw * o).astype(dt)
    z = (x @ k3m).reshape(n, h, w, kh, kw, o)
    rhs = _shifted_resize_matrices(h, hh, kh, dt)
    rws = _shifted_resize_matrices(w, ww, kw, dt)
    y1 = jnp.einsum("nhwtuo,tHh->nHwuo", z, rhs)
    a = jnp.einsum("nHwuo,uWw->nHWo", y1, rws)

    # Path B: composed 3x3 conv over the lateral (weights composed in f32).
    # At full res the 9-tap matmul+shift-add materializes a taps*Cout tensor
    # (1.27 GB at the eval shape — profiled at ~45 ms/frame fused into the
    # encoder); the space-to-depth phase conv keeps it at half res with
    # healthy channel counts instead.
    kc = jnp.einsum("ic,tuco->tuio", k1[0, 0].astype(jnp.float32),
                    k3.astype(jnp.float32)).astype(dt)
    # hh=2h and ww=2w are even by construction, so the s2d phase form always
    # applies (a small_conv fallback here would materialize the full-res
    # taps*Cout tensor noted above).
    b = small_conv_s2d(lateral.astype(dt), kc, None)

    # Border field for the 1x1 bias constant under the conv's zero padding.
    m = jnp.einsum("c,tuco->tuo", b1.astype(jnp.float32),
                   k3.astype(jnp.float32))
    g = jnp.einsum("ju,tuo->jto", _tap_validity(ww, kw), m)
    kfield = jnp.einsum("it,jto->ijo", _tap_validity(hh, kh), g).astype(dt)

    return a + b + kfield[None] + b3.astype(dt)
