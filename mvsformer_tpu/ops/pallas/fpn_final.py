"""Fused final FPN level as ONE Pallas TPU kernel.

The final top-down level (fpn.py FPNDecoder: out3(up2(intra2) +
inner3(conv01)), spec ref models/module.py:255-270) is the single biggest
XLA fusion cluster in the eval frame: the round-5 trace attribution
(docs/TRACE_ATTR.txt) shows ~22 ms/frame across six ops — the 2x upsample
phase FMA + its concat interleave, TWO full-res 64-channel layout copies
(copy.4577/4579, the round-4 verdict's unattributed top copies), the
inner3 1x1 matmul, the out3 taps-matmul z tensor ([N,1152,1536,9,8] bf16 =
1.27 GB), and the folded-BN multiply. Every one of those materializes a
full-res tensor in HBM; the minimal traffic is intra2 (283 MB) + conv01
(141 MB) + out3 (141 MB) ~ 570 MB/frame.

This kernel streams row-blocks and keeps everything else in VMEM. Like the
warp kernel it works in C-in-sublanes / W-in-lanes orientation (Pallas
operands arrive in default layout, so NHWC blocks would put the tiny
channel dim in lanes — the exact disease ops/smallconv.py documents):

  - 2x bilinear upsample (align_corners=True, matching ops/resize.py: the
    exact lo/frac lerp along H, the even/odd phase tent along W) computed
    in-register; W phases are never interleaved — all full-res row tensors
    live in (phase p, half-col q) space, and the output is emitted as
    [N, H, (p, o)=16, w], un-phased by one XLA transpose outside.
  - inner3 1x1 lateral: [64, 8] @ [8, w] per row phase on the MXU.
  - out3 3x3 conv via the SmallConv taps-matmul trick (ops/smallconv.py):
    zT = k3m^T @ x with rows (ty, tx, o) = 72; zT stays in VMEM scratch.
    H-taps are 24-sublane-slice adds across three z rows; W-taps/phases are
    8-sublane slices with one-lane shifts: even output cols tap
    (zo[q-1], ze[q], zo[q]), odd cols tap (ze[q], zo[q], ze[q+1]).
  - folded inference BatchNorm (f32-folded per-channel affine) + swish,
    in-register.

Eval/BN-only (like ops/pallas/vis_net.py); training and CPU keep the flax
path. Gated by ModelConfig.fused_fpn_final.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 8    # full-res output rows per grid step
RH = 8   # half-res input rows resident per step (covers lo(r0-1)..lo(r0+R)+1)


def _kernel(
    x2_ref,    # [N, h, 64, w] HBM (manual DMA; CW-transposed intra2)
    lat_ref,   # [N, 2h, 16, w] HBM (manual DMA; (phase, c) rows of conv01)
    w1_ref,    # [64, 8] VMEM (inner3 kernel, transposed)
    b1_ref,    # [64, 1] VMEM
    k3m_ref,   # [72, 64] VMEM ((ty, tx, o) sublanes)
    b3_ref,    # [8, 1] VMEM f32
    mul_ref,   # [8, 1] VMEM f32 (folded BN scale)
    add_ref,   # [8, 1] VMEM f32 (folded BN shift)
    out_ref,   # [1, R, 16, w] VMEM ((phase, o) rows of the output block)
    x2_buf,    # [2, RH, 64, w] VMEM scratch (double-buffered window)
    lat_buf,   # [2, R + 2, 16, w] VMEM scratch
    z_buf,     # [2, R + 2, 72, w] f32 VMEM scratch (phase-e / phase-o)
    sems,      # DMA semaphores (2, 2)
    *,
    h: int,
    w: int,
    HB: int,
):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    H = 2 * h
    den = 2 * h - 1
    f32 = jnp.float32

    n_step = n * HB + hb
    slot = jax.lax.rem(n_step, 2)

    def win(step_idx):
        """(x2 window start, lat window start) for grid step `step_idx`."""
        hh = jax.lax.rem(step_idx, HB)
        r0 = hh * R
        # lo(i) = floor(i * (h-1) / (2h-1)); window starts at lo(max(r0-1,0))
        i0 = jnp.maximum(r0 - 1, 0)
        y0 = jnp.clip((i0 * (h - 1)) // den, 0, h - RH)
        y0l = jnp.clip(r0 - 1, 0, H - (R + 2))
        return y0, y0l

    def dma_x2(step_idx, slot_idx):
        nn_ = step_idx // HB
        y0, _ = win(step_idx)
        return pltpu.make_async_copy(
            x2_ref.at[nn_, pl.ds(y0, RH)], x2_buf.at[slot_idx],
            sems.at[slot_idx, 0])

    def dma_lat(step_idx, slot_idx):
        nn_ = step_idx // HB
        _, y0l = win(step_idx)
        return pltpu.make_async_copy(
            lat_ref.at[nn_, pl.ds(y0l, R + 2)], lat_buf.at[slot_idx],
            sems.at[slot_idx, 1])

    @pl.when(n_step == 0)
    def _():
        dma_x2(n_step, slot).start()
        dma_lat(n_step, slot).start()
    dma_x2(n_step, slot).wait()
    dma_lat(n_step, slot).wait()

    @pl.when(n_step + 1 < pl.num_programs(0) * HB)
    def _():
        dma_x2(n_step + 1, 1 - slot).start()
        dma_lat(n_step + 1, 1 - slot).start()

    r0 = hb * R
    y0, y0l = win(n_step)

    w1 = w1_ref[...].astype(f32)     # [64, 8]
    b1 = b1_ref[...].astype(f32)     # [64, 1]
    k3m = k3m_ref[...]               # [72, 64] compute dtype

    # W-phase tent weights (align_corners=True; border tap weight is 0 so
    # the zero shift-in at q=0 / q=w-1 is exact).
    qf = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(f32)
    be = qf / float(2 * w - 1)                   # weight on x[q-1], even cols
    bo = (float(w - 1) - qf) / float(2 * w - 1)  # weight on x[q+1], odd cols

    zcol64 = jnp.zeros((64, 1), f32)

    # Stage 1: fill z_buf for intra rows i = r0-1 .. r0+R (slots 0..R+1).
    for s in range(R + 2):
        i = r0 + s - 1  # full-res row index (traced scalar)
        in_image = jnp.logical_and(i >= 0, i <= H - 1)

        # --- H lerp from the half-res window ---
        ic = jnp.clip(i, 0, H - 1)
        num = ic * (h - 1)
        lo = jnp.clip(num // den, 0, h - 2)
        f = (num - lo * den).astype(f32) / float(den)
        a = x2_buf[slot, pl.ds(lo - y0, 1)].reshape(64, w).astype(f32)
        b = x2_buf[slot, pl.ds(lo - y0 + 1, 1)].reshape(64, w).astype(f32)
        xh = a + f * (b - a)                     # [64, w]

        # --- W phase lerp (even / odd full-res columns) ---
        xm = jnp.concatenate([zcol64, xh[:, :-1]], axis=1)   # x[q-1]
        xp = jnp.concatenate([xh[:, 1:], zcol64], axis=1)    # x[q+1]
        xe = xh + be * (xm - xh)
        xo = xh + bo * (xp - xh)

        # --- lateral 1x1 (+ upsample add) per phase ---
        li = jnp.clip(i - y0l, 0, R + 1)
        lrow = lat_buf[slot, pl.ds(li, 1)].reshape(16, w).astype(f32)
        ie = xe + jax.lax.dot_general(
            w1, lrow[0:8], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + b1
        io = xo + jax.lax.dot_general(
            w1, lrow[8:16], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + b1

        # --- taps matmul; rows outside the image contribute zero taps ---
        valid = in_image.astype(f32)
        ie = (ie * valid).astype(k3m.dtype)
        io = (io * valid).astype(k3m.dtype)
        z_buf[0, s] = jax.lax.dot_general(
            k3m, ie, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        z_buf[1, s] = jax.lax.dot_general(
            k3m, io, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    b3 = b3_ref[...]
    mul = mul_ref[...]
    add = add_ref[...]
    zcol8 = jnp.zeros((8, 1), f32)

    def shift_m(t):  # out[:, q] = t[:, q-1], zero at q=0
        return jnp.concatenate([zcol8, t[:, :-1]], axis=1)

    def shift_p(t):  # out[:, q] = t[:, q+1], zero at q=w-1
        return jnp.concatenate([t[:, 1:], zcol8], axis=1)

    # Stage 2: H-tap sums (24-sublane slices across three z rows), then
    # W-tap / phase combination, affine + swish, store.
    for r in range(R):
        ue = (z_buf[0, r, 0:24] + z_buf[0, r + 1, 24:48]
              + z_buf[0, r + 2, 48:72])   # [24, w] = (tx, o)
        uo = (z_buf[1, r, 0:24] + z_buf[1, r + 1, 24:48]
              + z_buf[1, r + 2, 48:72])
        acc_e = shift_m(uo[0:8]) + ue[8:16] + uo[16:24]
        acc_o = ue[0:8] + uo[8:16] + shift_p(ue[16:24])
        ye = (acc_e + b3) * mul + add
        yo = (acc_o + b3) * mul + add
        ye = ye * jax.nn.sigmoid(ye)
        yo = yo * jax.nn.sigmoid(yo)
        out_ref[0, r, 0:8] = ye.astype(out_ref.dtype)
        out_ref[0, r, 8:16] = yo.astype(out_ref.dtype)


def fpn_final_level(intra2, lateral, w1, b1, k3, b3, bn_fold):
    """swish(BN_affine(Conv3x3(up2(intra2) + Conv1x1(lateral)))) in one pass.

    intra2:  [N, h, w, 64]  half-res decoder intra tensor (compute dtype)
    lateral: [N, 2h, 2w, 8] full-res encoder feature (conv01), or its
             (phase, c)-rows form [N, 2h, 16, w] from the fused encoder head
    w1/b1:   inner3 params  [1, 1, 8, 64] / [64]
    k3/b3:   out3 Conv_0    [3, 3, 64, 8] / [8]
    bn_fold: (mul [8], add [8]) f32 — folded inference BN affine
    returns  [N, 2h, 2w, 8] in intra2.dtype
    """
    N, h, w, c = intra2.shape
    assert c == 64, intra2.shape
    H = 2 * h
    assert H % R == 0 and w % 128 == 0, (H, w)
    HB = H // R
    dt = intra2.dtype

    x2t = jnp.transpose(intra2, (0, 1, 3, 2))  # [N, h, 64, w]
    if lateral.shape == (N, H, 16, w):
        # already in (phase, c) rows — produced by the fused encoder head
        latt = lateral.astype(dt)
    else:
        assert lateral.shape == (N, H, 2 * w, 8), lateral.shape
        latt = jnp.transpose(
            lateral.reshape(N, H, w, 2, 8), (0, 1, 3, 4, 2)
        ).reshape(N, H, 16, w).astype(dt)      # rows = (phase, c)
    w1t = jnp.transpose(w1[0, 0]).astype(dt)   # [64, 8]
    k3m = jnp.transpose(
        jnp.moveaxis(k3, 2, 0).reshape(64, 72)).astype(dt)  # [72, 64]
    mul, add = bn_fold

    kernel = functools.partial(_kernel, h=h, w=w, HB=HB)
    out = pl.pallas_call(
        kernel,
        grid=(N, HB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((64, 8), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((72, 64), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, 16, w), lambda n, hh: (n, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, 16, w), dt),
        scratch_shapes=[
            pltpu.VMEM((2, RH, 64, w), dt),
            pltpu.VMEM((2, R + 2, 16, w), dt),
            pltpu.VMEM((2, R + 2, 72, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x2t, latt, w1t, b1.astype(dt)[:, None], k3m,
      b3.astype(jnp.float32)[:, None], mul.astype(jnp.float32)[:, None],
      add.astype(jnp.float32)[:, None])
    # (p, o) rows -> NHWC full-res
    return jnp.transpose(
        out.reshape(N, H, 2, 8, w), (0, 1, 4, 2, 3)).reshape(N, H, 2 * w, 8)
