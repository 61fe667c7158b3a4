"""Fused FPN top-down levels as single Pallas TPU kernels.

A top-down FPN level (fpn.py FPNDecoder, spec ref models/module.py:255-270)
is  out_k = swish(BN(Conv3x3(up2(intra_prev) + Conv1x1(lateral)))), with the
new intra tensor feeding the next level. On the XLA path each level
materializes its full-res 64-channel intra tensor plus a taps-matmul z
tensor in HBM and pays layout copies at the upsample/add seams — the
round-5 trace attribution showed the FINAL level alone cost ~22 ms/frame
(including the round-4 verdict's two unattributed 55-60 ms copies), and
after fusing it the SAME structure one level up (out2, 576x768x16) became
the next biggest XLA cluster (~8 ms/frame).

This kernel runs one whole level per call, parameterized by the lateral
and output channel counts, streaming row-blocks and keeping everything
else in VMEM. Like the warp kernel it works in C-in-sublanes / W-in-lanes
orientation (Pallas operands arrive in default layout, so NHWC blocks
would put the tiny channel dim in lanes — the exact disease
ops/smallconv.py documents):

  - 2x bilinear upsample (align_corners=True, matching ops/resize.py: the
    exact lo/frac lerp along H, the even/odd phase tent along W) computed
    in-register; W phases are never interleaved — all full-res row tensors
    live in (phase p, half-col q) space, and the output is emitted as
    [N, H, (p, o)] rows, un-phased by one XLA transpose outside.
  - inner 1x1 lateral: [64, cl] @ [cl, w] per row phase on the MXU.
  - out 3x3 conv via the SmallConv taps-matmul trick (ops/smallconv.py):
    zT = k3m^T @ x with rows (ty, tx, o); zT stays in VMEM scratch.
    H-taps are 3co-sublane-slice adds across three z rows; W-taps/phases
    are co-sublane slices with one-lane shifts: even output cols tap
    (zo[q-1], ze[q], zo[q]), odd cols tap (ze[q], zo[q], ze[q+1]).
  - folded inference BatchNorm (f32-folded per-channel affine) + swish,
    in-register.
  - optionally (emit_intra) the level's new intra tensor is emitted as
    (phase, c64) rows for the NEXT level's kernel — one XLA transpose
    turns it into the [N, H, 64, W] CW form the next call consumes, so
    chained levels hand tensors kernel-to-kernel and the full-res NHWC
    intra never exists.

Eval/BN-only (like ops/pallas/vis_net.py); training and CPU keep the flax
path. Gated by ModelConfig.fused_fpn_final (final level) and
fused_fpn_l2 (level 2 chain). Parity tests: tests/test_fpn_final.py.
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
    x2_ref,    # [N, h, 64, w] HBM (manual DMA; CW-transposed intra_prev)
    lat_ref,   # [N, 2h, 2*cl, w] HBM (manual DMA; (phase, c) lateral rows)
    w1_ref,    # [64, cl] VMEM (inner kernel, transposed)
    b1_ref,    # [64, 1] VMEM
    k3m_ref,   # [9*co, 64] VMEM ((ty, tx, o) sublanes)
    b3_ref,    # [co, 1] VMEM f32
    mul_ref,   # [co, 1] VMEM f32 (folded BN scale)
    add_ref,   # [co, 1] VMEM f32 (folded BN shift)
    *rest,     # out_ref [1, R, 2*co, w], [intra_ref [1, R, 128, w]],
               # x2_buf, lat_buf, z_buf, sems
    h: int,
    w: int,
    HB: int,
    cl: int,
    co: int,
    emit_intra: bool,
):
    if emit_intra:
        out_ref, intra_ref, x2_buf, lat_buf, z_buf, sems = rest
    else:
        out_ref, x2_buf, lat_buf, z_buf, sems = rest
        intra_ref = None

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

    w1 = w1_ref[...].astype(f32)     # [64, cl]
    b1 = b1_ref[...].astype(f32)     # [64, 1]
    k3m = k3m_ref[...]               # [9*co, 64] compute dtype

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
        lrow = lat_buf[slot, pl.ds(li, 1)].reshape(2 * cl, w).astype(f32)
        ie = xe + jax.lax.dot_general(
            w1, lrow[0:cl], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + b1
        io = xo + jax.lax.dot_general(
            w1, lrow[cl:2 * cl], (((1,), (0,)), ((), ())),
            preferred_element_type=f32) + b1

        if emit_intra and 1 <= s <= R:
            intra_ref[0, s - 1, 0:64] = ie.astype(intra_ref.dtype)
            intra_ref[0, s - 1, 64:128] = io.astype(intra_ref.dtype)

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
    zcol = jnp.zeros((co, 1), f32)

    def shift_m(t):  # out[:, q] = t[:, q-1], zero at q=0
        return jnp.concatenate([zcol, t[:, :-1]], axis=1)

    def shift_p(t):  # out[:, q] = t[:, q+1], zero at q=w-1
        return jnp.concatenate([t[:, 1:], zcol], axis=1)

    # Stage 2: H-tap sums (3co-sublane slices across three z rows), then
    # W-tap / phase combination, affine + swish, store.
    for r in range(R):
        ue = (z_buf[0, r, 0:3 * co] + z_buf[0, r + 1, 3 * co:6 * co]
              + z_buf[0, r + 2, 6 * co:9 * co])   # [3co, w] = (tx, o)
        uo = (z_buf[1, r, 0:3 * co] + z_buf[1, r + 1, 3 * co:6 * co]
              + z_buf[1, r + 2, 6 * co:9 * co])
        acc_e = shift_m(uo[0:co]) + ue[co:2 * co] + uo[2 * co:3 * co]
        acc_o = ue[0:co] + uo[co:2 * co] + shift_p(ue[2 * co:3 * co])
        ye = (acc_e + b3) * mul + add
        yo = (acc_o + b3) * mul + add
        ye = ye * jax.nn.sigmoid(ye)
        yo = yo * jax.nn.sigmoid(yo)
        out_ref[0, r, 0:co] = ye.astype(out_ref.dtype)
        out_ref[0, r, co:2 * co] = yo.astype(out_ref.dtype)


def fpn_level(intra_prev, lateral, w1, b1, k3, b3, bn_fold,
              emit_intra: bool = False):
    """One fused FPN top-down level.

    intra_prev: [N, h, w, 64] NHWC (an XLA tensor) or [N, h, 64, w] CW
                (the previous fused level's un-phased intra output)
    lateral:    [N, 2h, 2w, cl] NHWC, or (phase, c) rows [N, 2h, 2cl, w]
                (e.g. conv01 from the fused encoder head)
    w1/b1:      inner 1x1 params [1, 1, cl, 64] / [64]
    k3/b3:      out conv params  [3, 3, 64, co] / [co]
    bn_fold:    (mul [co], add [co]) f32 folded inference-BN affine
    returns     out [N, 2h, 2w, co] NHWC — and with emit_intra also the
                new intra tensor [N, 2h, 64, 2w] in CW form (ready to be
                the next level's intra_prev).
    """
    N = intra_prev.shape[0]
    cl = w1.shape[2]
    co = k3.shape[3]
    if intra_prev.shape[2] == 64 and intra_prev.shape[3] != 64:
        x2t = intra_prev                       # already CW
        h, w = intra_prev.shape[1], intra_prev.shape[3]
    else:
        _, h, w, c64 = intra_prev.shape
        assert c64 == 64, intra_prev.shape
        x2t = jnp.transpose(intra_prev, (0, 1, 3, 2))  # [N, h, 64, w]
    H = 2 * h
    assert H % R == 0 and w % 128 == 0, (H, w)
    HB = H // R
    dt = x2t.dtype

    if lateral.shape == (N, H, 2 * cl, w):
        latt = lateral.astype(dt)              # already (phase, c) rows
    else:
        assert lateral.shape == (N, H, 2 * w, cl), lateral.shape
        latt = jnp.transpose(
            lateral.reshape(N, H, w, 2, cl), (0, 1, 3, 4, 2)
        ).reshape(N, H, 2 * cl, w).astype(dt)
    w1t = jnp.transpose(w1[0, 0]).astype(dt)   # [64, cl]
    k3m = jnp.transpose(
        jnp.moveaxis(k3, 2, 0).reshape(64, 9 * co)).astype(dt)  # [9co, 64]
    mul, add = bn_fold

    out_specs = [pl.BlockSpec((1, R, 2 * co, w), lambda n, hh: (n, hh, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((N, H, 2 * co, w), dt)]
    if emit_intra:
        out_specs.append(pl.BlockSpec((1, R, 128, w),
                                      lambda n, hh: (n, hh, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((N, H, 128, w), dt))

    kernel = functools.partial(_kernel, h=h, w=w, HB=HB, cl=cl, co=co,
                               emit_intra=emit_intra)
    res = pl.pallas_call(
        kernel,
        grid=(N, HB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((64, cl), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * co, 64), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda n, hh: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, RH, 64, w), dt),
            pltpu.VMEM((2, R + 2, 2 * cl, w), dt),
            pltpu.VMEM((2, R + 2, 9 * co, w), jnp.float32),
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
    out = jnp.transpose(
        res[0].reshape(N, H, 2, co, w), (0, 1, 4, 2, 3)).reshape(
            N, H, 2 * w, co)
    if not emit_intra:
        return out
    # (p, c64) rows -> CW full-res [N, H, 64, 2w] for the next level
    intra = jnp.transpose(
        res[1].reshape(N, H, 2, 64, w), (0, 1, 3, 4, 2)).reshape(
            N, H, 64, 2 * w)
    return out, intra


def fpn_final_level(intra2, lateral, w1, b1, k3, b3, bn_fold):
    """Back-compat wrapper for the final level (cl=8, co=8, no intra)."""
    return fpn_level(intra2, lateral, w1, b1, k3, b3, bn_fold,
                     emit_intra=False)
