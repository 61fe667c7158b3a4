"""Fused VisibilityNet as a single Pallas TPU kernel.

The visibility CNN (reference mvsformer_model.py:30-44: three 3x3 ConvBnReLU
1->16->16->8 + a 1x1 conv + sigmoid) runs per source view at FULL resolution.
In the XLA graph its 8/16-channel NHWC tensors get channel-minor T(2,128)
layouts and the whole stack runs at ~100 GB/s effective — a round-2 profile
attributed ~13 ms/frame to it (docs/DESIGN.md). The arithmetic is trivial
(~50 GFLOP/frame); the cost is pure HBM traffic on intermediates.

This kernel computes the ENTIRE net per (batch, row-block) grid step with all
intermediates resident in VMEM:

  * activations live as [C, rows, W] — W in lanes, channels in sublanes — so
    every op is lane-dense regardless of channel count;
  * each 3x3 conv is computed as 3 per-dx left-contraction MXU dots over a
    dy-stacked [3*Cin, Cout] kernel slab (the "dot3" default — fewer, larger
    MXU issues); the legacy 9 per-tap [Cin, Cout] dot form is kept behind
    MVSTPU_VIS_DOT3=0 (read once at import). Either way there is no patch
    buffer, so 16-row blocks fit VMEM and the grid has fewer steps;
  * BatchNorm is pre-folded to a per-channel affine (running stats — the
    kernel serves inference; training uses the flax path);
  * the entropy band DMA is double-buffered across grid steps (the first cut
    was fixed-overhead-bound at ~14us/step, mostly serial DMA waits);
  * HBM traffic is exactly: entropy in, weight map out.

Row halo (3 rows each side for the three stacked 3x3 convs) is DMA'd with an
8-aligned clamped static-size band and realigned in-VMEM by a one-hot
selection matmul (Mosaic lowers neither dynamic_slice nor sublane rotates);
zero-padding semantics identical to torch's p=1 convs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 3  # three stacked 3x3 convs

# Read once at import so the choice is stable across jit tracing (changing the
# env var mid-process would otherwise silently reuse the first-traced variant).
_DOT3_DEFAULT = os.environ.get("MVSTPU_VIS_DOT3", "1") == "1"

from mvsformer_tpu.ops.pallas.warp_corr import (  # noqa: E402
    _barrier, _barrier_small,
)
# (shared MVSTPU_KERNEL_BARRIER experiment switch — see warp_corr.py)


def _shift_w(x, dx, w):
    """Static lane-shift: x [..., W+2] -> x[..., dx:dx+w]."""
    return jax.lax.slice_in_dim(x, dx, dx + w, axis=x.ndim - 1)


def _conv3x3(x, k2, mul, add, rows_out):
    """x [Cin, R_in, W] bf16 -> relu(affine(conv)) [Cout, rows_out, W] bf16.

    k2: [9*Cin, Cout] with tap-major, cin-minor row order. Accumulates one
    [Cin, Cout] x [Cin, rows_out*W] dot per tap in f32 — no patch buffer.
    """
    cin, r_in, w = x.shape
    cout = k2.shape[1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
    acc = None
    t = 0
    for dy in range(3):
        for dx in range(3):
            xs = _shift_w(xp[:, dy:dy + rows_out, :], dx, w)
            kt = jax.lax.slice_in_dim(k2, t * cin, (t + 1) * cin, axis=0)
            y = jax.lax.dot_general(
                kt.astype(jnp.bfloat16), xs.reshape(cin, rows_out * w),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
            t += 1
    # mul/add arrive as [C, 1] (2-D — Mosaic can't reshape 1-D vectors);
    # apply the affine on the 2-D result via sublane broadcast.
    acc = jnp.maximum(acc * mul + add, 0.0).astype(jnp.bfloat16)
    return acc.reshape(cout, rows_out, w)


def _conv3x3_dot3(x, kd, mul, add, rows_out):
    """Same conv as _conv3x3, as THREE K=3*Cin dots + output lane shifts.

    The per-tap form materializes 9 lane-UNALIGNED slices of the wide input
    (xp is W+2 lanes) and issues 9 K=Cin dots — both VMEM-stack- and
    MXU-pipeline-hostile (rb=16 already sat at ~11 MB stack / 61 us per grid
    step). Here the dy taps are stacked once into a [3*Cin, rows*W] patch
    (three sublane-offset copies, lane-aligned), each dx issues ONE dot with
    K=3*Cin, and the +-1 dx alignment happens on the small [Cout, rows, W]
    f32 output via zero-filled lane shifts — out(c) = y0(c-1)+y1(c)+y2(c+1),
    identical zero-padding semantics to the padded-input form.

    kd: [3, 3*Cin, Cout], kd[dx, dy*Cin+ci, co] = hwio[dy, dx, ci, co].
    """
    cin, r_in, w = x.shape
    cout = kd.shape[2]
    xd = jnp.concatenate(
        [x[:, dy:dy + rows_out, :] for dy in range(3)], axis=0)
    xd = xd.reshape(3 * cin, rows_out * w)
    acc = None
    for dx in range(3):
        y = jax.lax.dot_general(
            kd[dx].astype(jnp.bfloat16), xd,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(cout, rows_out, w)
        if dx == 0:
            y = jnp.concatenate(
                [jnp.zeros((cout, rows_out, 1), y.dtype), y[..., :-1]],
                axis=-1)
        elif dx == 2:
            y = jnp.concatenate(
                [y[..., 1:], jnp.zeros((cout, rows_out, 1), y.dtype)],
                axis=-1)
        acc = y if acc is None else acc + y
    acc = acc.reshape(cout, rows_out * w)
    acc = jnp.maximum(acc * mul + add, 0.0).astype(jnp.bfloat16)
    return acc.reshape(cout, rows_out, w)


def _vis_kernel(ent_hbm, k0, k1, k2, k3, m0, a0, m1, a1, m2, a2,
                out_ref, band2, sem2, *, rb, h, w, nbd, hb_total,
                dot3=False):
    b = pl.program_id(0)
    hb = pl.program_id(1)
    n_b = pl.num_programs(0)
    step = b * hb_total + hb
    slot = jax.lax.rem(step, 2)

    def start_of(hh):
        # 8-aligned clamped band start; the selection matmul absorbs d.
        s = jnp.clip(hh * rb - HALO, 0, h - nbd)
        return (s // 8) * 8

    def dma(bb, hh, slot_idx):
        return pltpu.make_async_copy(
            ent_hbm.at[bb, pl.ds(start_of(hh), nbd), :],
            band2.at[slot_idx], sem2.at[slot_idx])

    @pl.when(step == 0)
    def _():
        dma(b, hb, slot).start()

    @pl.when(step + 1 < n_b * hb_total)
    def _():
        nstep = step + 1
        dma(nstep // hb_total, jax.lax.rem(nstep, hb_total), 1 - slot).start()

    dma(b, hb, slot).wait()

    r0 = hb * rb
    s = start_of(hb)
    # Virtual band row j == global row r0-3+j; vb[j] = band[j + d] with
    # d = (r0-3) - s, zeros where j+d is outside the band (exactly the
    # out-of-image rows, given the clamp invariants + H % 8 == 0).
    d = (r0 - HALO) - s
    nb = rb + 2 * HALO
    jj = jax.lax.broadcasted_iota(jnp.int32, (nb, nbd), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (nb, nbd), 1)
    sel = (ii == jj + d).astype(jnp.float32)
    vb = jax.lax.dot_general(sel, band2[slot], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    def mask_rows(y, start):
        # Rows outside [0, H) must be EXACT zeros for the next conv's
        # zero-padding semantics — the folded BN affine + relu otherwise
        # leaves relu(add) != 0 in the halo (conv-of-zeros is not zero).
        g = start + jax.lax.broadcasted_iota(jnp.int32, (1, y.shape[1], 1), 1)
        return jnp.where((g >= 0) & (g < h), y, jnp.zeros_like(y))

    conv = _conv3x3_dot3 if dot3 else _conv3x3
    x0 = vb.astype(jnp.bfloat16)[None]                      # [1, rb+6, W]
    y0 = conv(x0, k0[...], m0[...], a0[...], rb + 4)        # [16, rb+4, W]
    y0 = mask_rows(y0, r0 - 2)
    y1 = conv(y0, k1[...], m1[...], a1[...], rb + 2)        # [16, rb+2, W]
    y1 = mask_rows(y1, r0 - 1)
    y2 = conv(y1, k2[...], m2[...], a2[...], rb)            # [8, rb, W]
    # 1x1 conv (8 -> 1, with bias) + sigmoid, f32.
    k3v = k3[...]  # [1, 9] — 8 weights + bias in one padded lane row
    logit = jnp.zeros((rb, w), jnp.float32)
    for c in range(8):
        logit = logit + y2[c].astype(jnp.float32) * k3v[0, c]
    logit = logit + k3v[0, 8]
    out_ref[0] = jax.nn.sigmoid(logit)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_visibility(ent, k0, k1, k2, k3, b3, bn_stats,
                     block_rows: int = 16, interpret: bool = False):
    """Run the whole visibility CNN in one Pallas kernel.

    ent: [B, H, W] f32 entropy map (H % 8 == 0). k0/k1/k2: [3,3,Cin,Cout]
    conv kernels (flax HWIO). k3: [1,1,8,1], b3: [1]. bn_stats:
    ((scale,bias,mean,var) x3) per ConvBnReLU, each [C] f32.
    Returns [B, H, W] f32 weights.
    """
    B, H, W = ent.shape
    rb = min(block_rows, max(8, (H // 2) // 8 * 8))
    nbd = -(-(rb + 2 * HALO + 7) // 8) * 8  # DMA band rows (8-aligned)
    # H % 8 == 0 keeps the top-clamped, floor-aligned DMA window inside the
    # image while still covering [r0-3, r0+rb+3).
    assert H >= nbd and H % 8 == 0, (H, rb)

    def fold(st):
        scale, bias, mean, var = [a.astype(jnp.float32) for a in st]
        inv = jax.lax.rsqrt(var + 1e-5)
        mul = scale * inv
        return mul, bias - mean * mul

    (m0, a0), (m1, a1), (m2, a2) = [
        tuple(v.reshape(-1, 1) for v in fold(st)) for st in bn_stats]
    # dot3 form (default): [3, 3*Cin, Cout] dx-major packing; legacy per-tap
    # form keeps the [9*Cin, Cout] tap-major layout (MVSTPU_VIS_DOT3=0).
    dot3 = _DOT3_DEFAULT
    if dot3:
        def pack(k):
            kk = jnp.transpose(k, (1, 0, 2, 3))  # [dx, dy, ci, co]
            return kk.reshape(3, kk.shape[1] * kk.shape[2], kk.shape[3])
        k0r, k1r, k2r = pack(k0), pack(k1), pack(k2)
    else:
        k0r = k0.reshape(9 * 1, 16)
        k1r = k1.reshape(9 * 16, 16)
        k2r = k2.reshape(9 * 16, 8)
    # 8 tap weights + bias packed into one padded lane row.
    k3r = jnp.concatenate(
        [k3.reshape(8), b3.reshape(1)]).astype(jnp.float32).reshape(1, 9)

    hb_total = pl.cdiv(H, rb)
    grid = (B, hb_total)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    if not interpret:
        # In-model, XLA likes to leave the producer's output in scoped VMEM
        # (S(1)); the banded row DMA from a VMEM-resident ref ran 20x slower
        # than from HBM (3.1 ms vs 0.15 ms per stage-4 call, round-2 trace).
        ent = pltpu.with_memory_space_constraint(ent, pltpu.MemorySpace.HBM)
    return pl.pallas_call(
        functools.partial(_vis_kernel, rb=rb, h=H, w=W, nbd=nbd,
                          hb_total=hb_total, dot3=dot3),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            small, small, small, small,
            small, small, small, small, small, small,
        ],
        out_specs=pl.BlockSpec((1, rb, W), lambda b, hb: (b, hb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nbd, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*_barrier(ent),
      *_barrier_small(k0r, k1r, k2r, k3r, m0, a0, m1, a1, m2, a2))
