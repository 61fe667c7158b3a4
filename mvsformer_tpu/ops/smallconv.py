"""Tiny-channel convolutions as matmul + shift-add.

Why this exists: XLA's TPU convolution emitter picks channel-minor
T(2,128)/T(8,128) layouts, so a conv whose output has 1..32 channels uses
1/128..32/128 of each vector register and runs at single-digit GB/s. The
cascade is full of exactly these convs — the cost-regularization `prob` head
(8->1), the visibility CNN (1->16->16->8->1), the FPN out blocks (64->8/16/32),
the 3D U-Net's strided down-convs and transposed up-convs (8..64 ch) — and
round-2 TPU profiles attribute ~35% of the eval frame to them at 2-50 GB/s
effective bandwidth (docs/DESIGN.md, round-2 attribution table).

The reformulation family (all exact, equal-FLOPs-or-better, pure JAX, and
autodiff-friendly so they serve training too):

* stride-1 conv: ONE matmul x[..., Cin] @ K2[Cin, T*Cout] (T = prod(kernel)
  taps at once, lane-friendly N = T*Cout), then T shifted slice-adds that XLA
  fuses into a single streaming loop fusion.
* strided conv (torch padding p=(k-1)//2): space-to-depth the input by the
  stride (channels become prod(s)*Cin — even MORE lane-friendly), rearrange
  the kernel into per-phase taps, then the same VALID matmul + shift-add at
  OUTPUT resolution (no wasted positions).
* transposed conv (flax explicit-padding semantics): one full-tap matmul at
  input resolution, then a phase decomposition — each of the prod(s) output
  phases is a shift-add over its disjoint tap subset — and a reshape
  interleave. Total slice-adds = prod(kernel), the same as stride-1.

Every tensor keeps the spatial W dimension minor, so downstream
softmax/argmax/regression reductions inherit sane layouts too (a
size-1-minor conv output used to poison the whole stage tail).

Functional spec of the consumers: reference models/module.py:558-560 (prob
head), mvsformer_model.py:37 (vis conv), module.py:208-302 (FPN outs),
module.py:469-594 (cost-reg U-Nets: strided Conv3d + ConvTranspose3d).
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Channel threshold below which the matmul+shift-add path beats XLA's conv
# emitter on TPU (lane width 128; measured crossover is well above 32).
SMALL_CH_MAX = 32


def _shift_add_valid(zp, taps_shape, out_spatial):
    """Sum shifted windows of a per-tap matmul output.

    zp: [B, *U, T, Cout] (already padded so every window is in range),
    taps_shape: per-axis tap counts with T = prod(taps_shape),
    returns [B, *out_spatial, Cout].
    """
    out = None
    for t, offs in enumerate(itertools.product(*[range(m) for m in taps_shape])):
        sl = ((slice(None),)
              + tuple(slice(o, o + n) for o, n in zip(offs, out_spatial))
              + (t,))
        term = zp[sl]
        out = term if out is None else out + term
    return out


def _tap_matmul(x, kernel):
    """x [B,*S,Cin] @ kernel [*ks,Cin,Cout] -> z [B,*S,T,Cout] (all taps)."""
    *ks, cin, cout = kernel.shape
    taps = math.prod(ks)
    k2 = kernel.reshape(taps, cin, cout)
    k2 = jnp.moveaxis(k2, 1, 0).reshape(cin, taps * cout)
    z = x @ k2  # one MXU matmul for all taps
    return z.reshape(x.shape[:-1] + (taps, cout))


def small_conv(x, kernel, bias=None, strides=None):
    """Conv with torch padding p=(k-1)//2 via matmul + shift-add.

    x: [B, *spatial, Cin]; kernel: [*ks, Cin, Cout]; bias: [Cout] or None;
    strides: per-axis ints (None = all 1). Stride-1 requires odd kernels
    (torch pad == SAME); strided axes may have any kernel size.
    Returns [B, *out_spatial, Cout], out = (S + 2p - k)//s + 1.
    """
    *ks, cin, cout = kernel.shape
    assert x.shape[-1] == cin, (x.shape, kernel.shape)
    nd = len(ks)
    strides = (1,) * nd if strides is None else tuple(strides)
    assert len(strides) == nd
    if any(s > 1 for s in strides):
        out = _small_conv_strided(x, kernel, strides)
    else:
        assert all(k % 2 == 1 for k in ks), ks
        spatial = x.shape[1:-1]
        z = _tap_matmul(x, kernel)
        if math.prod(ks) == 1:
            out = z[..., 0, :]
        else:
            pad = ([(0, 0)] + [(k // 2, k // 2) for k in ks] + [(0, 0), (0, 0)])
            out = _shift_add_valid(jnp.pad(z, pad), ks, spatial)
    if bias is not None:
        out = out + bias
    return out


def _small_conv_strided(x, kernel, strides):
    """Strided conv: space-to-depth by the stride, then VALID shift-add.

    y[q] = sum_t x[q*s + t - p] K[t] with t - p = s*m + rho becomes a
    stride-1 conv over xd[u, (rho, c)] = xpad[s*u + rho] with taps m:
    y[q] = sum_{m, rho} xd[q + m', rho] K[p + s*(m' + m_lo) + rho].
    The matmul runs at OUTPUT resolution with prod(s)*Cin input channels.
    """
    *ks, cin, cout = kernel.shape
    nd = len(ks)
    spatial = x.shape[1:-1]
    ps = [(k - 1) // 2 for k in ks]
    outs = [(S + 2 * p - k) // s + 1
            for S, p, k, s in zip(spatial, ps, ks, strides)]
    m_lo = [-((p + s - 1) // s) for p, s in zip(ps, strides)]
    m_hi = [(k - 1 - p) // s for k, p, s in zip(ks, ps, strides)]
    M = [hi - lo + 1 for lo, hi in zip(m_lo, m_hi)]
    U = [o + m - 1 for o, m in zip(outs, M)]
    L = [s * u for s, u in zip(strides, U)]
    # xd2[u, rho] = x[s*(u + m_lo) + rho]  =>  left pad = -s*m_lo
    left = [-s * lo for s, lo in zip(strides, m_lo)]

    pad = ([(0, 0)]
           + [(l, max(0, Li - l - S)) for l, Li, S in zip(left, L, spatial)]
           + [(0, 0)])
    xp = jnp.pad(x, pad)
    xp = xp[(slice(None),) + tuple(slice(0, Li) for Li in L) + (slice(None),)]
    # space-to-depth: [B, U1, s1, ..., Ud, sd, C] -> [B, *U, prod(s)*C]
    shp = [xp.shape[0]]
    for u, s in zip(U, strides):
        shp += [u, s]
    xp = xp.reshape(shp + [cin])
    perm = ([0] + [1 + 2 * i for i in range(nd)]
            + [2 + 2 * i for i in range(nd)] + [2 * nd + 1])
    xp = xp.transpose(perm)
    cin2 = math.prod(strides) * cin
    xp = xp.reshape([xp.shape[0]] + list(U) + [cin2])
    # kernel -> per-(m, rho) layout matching the space-to-depth channel order
    left_k = [-(p + s * lo) for p, s, lo in zip(ps, strides, m_lo)]
    kpad = jnp.pad(kernel,
                   [(lk, Mi * s - lk - k)
                    for lk, Mi, s, k in zip(left_k, M, strides, ks)]
                   + [(0, 0), (0, 0)])
    shp = []
    for Mi, s in zip(M, strides):
        shp += [Mi, s]
    kpad = kpad.reshape(shp + [cin, cout])
    perm = ([2 * i for i in range(nd)] + [2 * i + 1 for i in range(nd)]
            + [2 * nd, 2 * nd + 1])
    kpad = kpad.transpose(perm).reshape(list(M) + [cin2, cout])

    z = _tap_matmul(xp, kpad)
    if math.prod(M) == 1:
        return z[..., 0, :]
    return _shift_add_valid(z, M, outs)


def small_conv_transpose(x, kernel, strides, padding, bias=None):
    """Transposed conv matching flax nn.ConvTranspose with EXPLICIT padding.

    lax.conv_transpose passes explicit (lo, hi) pairs straight through to the
    stride-dilated input (verified empirically vs jax), i.e.
        out[q] = sum_j xd[q + j - lo] K[j],   xd = dilate(x, s).
    Phase decomposition: for output phase r = q mod s, only taps
    j = jr + s*v with jr = (lo - r) mod s land on real samples:
        out[s*u + r] = sum_v x[u + v + e_r] K[jr + s*v],
        e_r = (r + jr - lo) // s.
    One full-tap matmul at input resolution; each tap is consumed by exactly
    one phase, so total slice-adds = prod(kernel).
    """
    *ks, cin, cout = kernel.shape
    assert x.shape[-1] == cin, (x.shape, kernel.shape)
    nd = len(ks)
    spatial = x.shape[1:-1]
    strides = tuple(strides)
    padding = tuple(tuple(p) for p in padding)
    out_len = [(S - 1) * s + 1 + lo + hi - (k - 1)
               for S, s, (lo, hi), k in zip(spatial, strides, padding, ks)]
    Q = [-(-o // s) for o, s in zip(out_len, strides)]  # per-phase length
    axis_phases = []
    for k, s, (lo, hi) in zip(ks, strides, padding):
        phases = []
        for r in range(s):
            jr = (lo - r) % s
            e = (r + jr - lo) // s
            V = 0 if jr >= k else -(-(k - jr) // s)
            phases.append((jr, e, V))
        axis_phases.append(phases)
    negs = [max(0, max(-e for (_, e, _) in ph)) for ph in axis_phases]
    poss = [max(0, max((q - 1) + max(V - 1, 0) + e - (S - 1)
                       for (_, e, V) in ph))
            for ph, q, S in zip(axis_phases, Q, spatial)]

    z = _tap_matmul(x, kernel)
    zp = jnp.pad(z, [(0, 0)] + [(n, p) for n, p in zip(negs, poss)]
                 + [(0, 0), (0, 0)])
    phase_outs = []
    for rs in itertools.product(*[range(s) for s in strides]):
        per_axis = [axis_phases[i][rs[i]] for i in range(nd)]
        if any(V == 0 for (_, _, V) in per_axis):
            phase_outs.append(
                jnp.zeros((x.shape[0],) + tuple(Q) + (cout,), z.dtype))
            continue
        acc = None
        for vs in itertools.product(*[range(V) for (_, _, V) in per_axis]):
            t = 0
            for (jr, _, _), s, v, k in zip(per_axis, strides, vs, ks):
                t = t * k + (jr + s * v)
            sl = ((slice(None),)
                  + tuple(slice(e + v + n, e + v + n + q)
                          for (_, e, _), v, n, q
                          in zip(per_axis, vs, negs, Q))
                  + (t,))
            term = zp[sl]
            acc = term if acc is None else acc + term
        phase_outs.append(acc)
    # interleave phases: [s1..sd, B, Q1..Qd, O] -> [B, Q1, s1, ..., O]
    P = jnp.stack(phase_outs).reshape(tuple(strides) + phase_outs[0].shape)
    perm = [nd]
    for i in range(nd):
        perm += [nd + 1 + i, i]
    perm += [2 * nd + 1]
    out = P.transpose(perm).reshape(
        (x.shape[0],) + tuple(s * q for s, q in zip(strides, Q)) + (cout,))
    out = out[(slice(None),) + tuple(slice(0, o) for o in out_len)
              + (slice(None),)]
    if bias is not None:
        out = out + bias
    return out


def _space_to_depth(x, b):
    """[N,H,W,C] -> [N,H/b,W/b,b*b*C], phase-major channel order (ry,rx,c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * c)


def _depth_to_space(x, b, c):
    """Inverse of _space_to_depth."""
    n, h, w, _ = x.shape
    x = x.reshape(n, h, w, b, b, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * b, w * b, c)


def _phase_map(k: int, b: int):
    """A[py, m - m_lo, r, t] = 1 iff full-res tap t for output phase py lands
    on s2d tap (m, r): py + t - p = b*m + r. Returns (A as np.float32, m_lo)."""
    import numpy as np
    p = (k - 1) // 2
    sy = np.arange(b)[:, None] + np.arange(k)[None, :] - p  # [b, k]
    m = np.floor_divide(sy, b)
    r = sy - b * m
    m_lo, m_hi = int(m.min()), int(m.max())
    a = np.zeros((b, m_hi - m_lo + 1, b, k), np.float32)
    for py in range(b):
        for t in range(k):
            a[py, m[py, t] - m_lo, r[py, t], t] = 1.0
    return a, m_lo, m_hi


def small_conv_s2d(x, kernel, bias=None, block=2):
    """Stride-1 2D conv with torch padding as an exact space-to-depth conv.

    The taps*Cout matmul form (small_conv) stops paying past ~144 tap-channels
    (z traffic), and XLA's conv emitter runs tiny-channel full-res convs at
    single-digit lane occupancy — the FPN encoder's conv00 (7x7, 3->8) and
    conv01 (5x5, 8->8) at the eval shape sit in exactly that gap. Phase
    decomposition closes it: out = D2S(conv_{K2}(S2D(x))) where S2D blocks
    b x b pixels into channels (3->12, 8->32) at 1/b res and K2 is the exact
    phase rearrangement of the original kernel (zero-padded full-res borders
    correspond 1:1 to zero-padded s2d borders, so torch padding is preserved
    bit-exactly in f32). Requires even spatial dims; the caller guards.
    """
    kh, kw, cin, cout = kernel.shape
    n, h, w, _ = x.shape
    b = block
    ay, mlo_y, mhi_y = _phase_map(kh, b)
    ax, mlo_x, mhi_x = _phase_map(kw, b)
    # K2[M, N, (ry, rx, ci), (py, px, co)] — channel orders match the
    # (phase-y, phase-x, c) packing of _space_to_depth / _depth_to_space.
    k2 = jnp.einsum("pmrt,qnsu,tuio->mnrsipqo", jnp.asarray(ay),
                    jnp.asarray(ax), kernel.astype(jnp.float32))
    mh, nw = k2.shape[0], k2.shape[1]
    k2 = k2.reshape(mh, nw, b * b * cin, b * b * cout).astype(x.dtype)
    x2 = _space_to_depth(x, b)
    y2 = jax.lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1),
        padding=((-mlo_y, mhi_y), (-mlo_x, mhi_x)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y2 = y2 + jnp.tile(bias, b * b)
    return _depth_to_space(y2, b, cout)


class SmallConv(nn.Module):
    """Drop-in for torch-padded `nn.Conv` with a tiny channel count.

    Parameter tree (names, shapes, inits) is IDENTICAL to nn.Conv — kernel
    [*ks, Cin, Cout] (lecun_normal), bias [Cout] (zeros) — so checkpoints and
    the torch-weight converter are unaffected by the compute reformulation.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    phase_s2d: bool = False  # stride-1 2D: route through small_conv_s2d

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        strides = ((self.strides,) * len(ks)
                   if isinstance(self.strides, int) else tuple(self.strides))
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            ks + (x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        if self.phase_s2d:
            # small_conv_s2d is a stride-1 formulation; a strided SmallConv
            # routed here would silently compute the wrong thing.
            assert all(s == 1 for s in strides), \
                f"phase_s2d requires stride 1, got {strides}"
            return small_conv_s2d(x, kernel, bias)
        return small_conv(x, kernel, bias, strides=strides)


class SmallConvTranspose(nn.Module):
    """Drop-in for explicit-padding `nn.ConvTranspose`, tiny channel count.

    Parameter tree matches nn.ConvTranspose (kernel [*ks, Cin, Cout],
    lecun_normal; bias zeros), so the swap is checkpoint-transparent.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Sequence[Sequence[int]]
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
        return small_conv_transpose(x, kernel, tuple(self.strides),
                                    self.padding, bias)
