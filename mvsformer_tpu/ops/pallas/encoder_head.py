"""Fused FPN-encoder head (conv00 + conv01 + downsample1) as ONE Pallas kernel.

Why this exists: the fused final-FPN-level kernel (ops/pallas/fpn_final.py)
needs the full-res lateral (conv01) as a phase-form operand, but ANY Pallas
consumer of conv01 forces default-layout on it and XLA's layout assignment
then propagates that demand up through conv01 into conv00, flipping both
full-res encoder convs off the fast conv emitter (measured: conv00 3.2 ->
27 ms/frame as a kLoop fusion; an optimization_barrier does NOT stop the
propagation). The only clean escape is to PRODUCE conv01 in a kernel whose
input is the jit entry parameter (imgs) — entry layouts are host-defined,
so there is nothing upstream to poison. Swallowing downsample1 as well
removes the need to ever materialize conv01 in NHWC.

Functional spec (ref models/module.py:208-270 FPNEncoder head):
    conv00 = lrelu0.1(BN(Conv7x7(img, 3->8)))
    conv01 = lrelu0.1(BN(Conv5x5(conv00, 8->8)))      -> final-level lateral
    down0  = lrelu0.1(BN(Conv5x5s2(conv01, 8->16)))   -> rest of the encoder

All spatial math runs in W-phase space with channels in sublanes and
half-res columns in lanes (C-in-sublane / w-in-lane, like the warp and
fpn_final kernels): a full-res column j = 2q + p becomes (phase p, half-col
q), so a stride-1 conv's x-taps turn into per-shift matmuls
  out[(p,o), q] = sum_s shift_s( M_s @ stacked )[(p,o), q]
where `stacked` is ty-contiguous rows of the input ring ([ty*(2 phases *
C)] sublanes — a FREE contiguous-row reshape of the ring scratch), M_s
holds the kernel taps with t = 2s + sp - p, and shift_s is a lane shift
with zero fill (== the conv's zero padding). The stride-2 downsample is the
same algebra restricted to output phase 0 on even rows.

Outputs:
  latt  [N, H, 16, w]  — conv01 in (phase, c) rows, fed straight to
                         fpn_final_level (never re-laid-out by XLA)
  down0 [N, H/2, 16, w] — downsample1 output in (c16) rows; one XLA
                         transpose turns it NHWC for conv10

Eval/BN-only; training/CPU keep the flax path. Parity test:
tests/test_encoder_head.py against the lax.conv reference chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 16      # full-res conv01/latt rows per grid step
IMGW = 30   # img window rows per step: r0-7 .. r0+R+6  (R + 14)
C00 = 24    # conv00 ring rows per step: r0-4 .. r0+R+3  (R + 8)
C01 = 20    # conv01 ring rows per step: r0-2 .. r0+R+1  (R + 4)


def _phase_matrices(k, kh, kw, p_out_phases, c_in, c_out, shifts,
                    cpad=None):
    """M_s selection matrices for a kH x kW kernel in W-phase space.

    Returns [n_shifts, rows, cols] with rows = (p, o) over p_out_phases
    (p iterates phases; for the stride-2 down conv p_out_phases = [0] and
    rows = o only), cols = (ty, sp, c_in). t = 2s + sp - p must land in
    [-(kW//2), kW//2]; taps outside contribute zero.

    `k` is a traced [kh, kw, c_in, c_out] param, so the selection is built
    as a static gather-index + mask over k.reshape(-1).
    """
    half = kw // 2
    rows = len(p_out_phases) * c_out
    cpad = cpad if cpad is not None else 2 * c_in  # sublanes per ty group
    cols = kh * cpad
    idx = np.zeros((len(shifts), rows, cols), np.int32)
    msk = np.zeros((len(shifts), rows, cols), np.float32)
    for si, s in enumerate(shifts):
        for pi, p in enumerate(p_out_phases):
            for sp in range(2):
                t = 2 * s + sp - p
                if not (-half <= t <= half):
                    continue
                tx = t + half
                for ty in range(kh):
                    for c in range(c_in):
                        col = ty * cpad + sp * c_in + c
                        for o in range(c_out):
                            flat = ((ty * kw + tx) * c_in + c) * c_out + o
                            idx[si, pi * c_out + o, col] = flat
                            msk[si, pi * c_out + o, col] = 1.0
    kf = k.reshape(-1).astype(jnp.float32)
    return jnp.take(kf, jnp.asarray(idx)) * jnp.asarray(msk)


def _kernel(
    img_ref,    # [N, H+16, 8, w] HBM (manual DMA; (sp, c3) rows of imgs
                # padded to 8 sublanes — Mosaic HBM slices need 8-aligned
                # sublane dims — with 8 zero rows top and bottom)
    m00_ref,    # [5, 16, 56] VMEM
    m01_ref,    # [3, 16, 80] VMEM
    mdn_ref,    # [3, 16, 80] VMEM
    aff_ref,    # [6, 16, 1] VMEM f32: mul00, add00, mul01, add01, muld, addd
    latt_ref,   # [1, R, 16, w] VMEM out
    down_ref,   # [1, R//2, 16, w] VMEM out
    img_buf,    # [2, IMGW, 8, w] VMEM scratch
    c00_buf,    # [C00, 16, w] VMEM scratch (bf16/compute dtype)
    c01_buf,    # [C01, 16, w] VMEM scratch
    sems,       # DMA semaphores (2,)
    *,
    H: int,
    w: int,
    HB: int,
):
    n = pl.program_id(0)
    hb = pl.program_id(1)
    f32 = jnp.float32

    n_step = n * HB + hb
    slot = jax.lax.rem(n_step, 2)

    def y0i_of(step_idx):
        # padded-image row of real row (r0 - 7) is r0 - 7 + 8 = r0 + 1
        hh = jax.lax.rem(step_idx, HB)
        return hh * R + 1

    def dma(step_idx, slot_idx):
        nn_ = step_idx // HB
        return pltpu.make_async_copy(
            img_ref.at[nn_, pl.ds(y0i_of(step_idx), IMGW)],
            img_buf.at[slot_idx], sems.at[slot_idx])

    @pl.when(n_step == 0)
    def _():
        dma(n_step, slot).start()
    dma(n_step, slot).wait()

    @pl.when(n_step + 1 < pl.num_programs(0) * HB)
    def _():
        dma(n_step + 1, 1 - slot).start()

    r0 = hb * R

    def shift_lane(t, s, rows):
        if s == 0:
            return t
        z = jnp.zeros((rows, abs(s)), f32)
        if s > 0:   # out[:, q] = t[:, q+s]
            return jnp.concatenate([t[:, s:], z], axis=1)
        return jnp.concatenate([z, t[:, :s]], axis=1)

    mul00 = aff_ref[0]   # [16, 1]
    add00 = aff_ref[1]
    mul01 = aff_ref[2]
    add01 = aff_ref[3]
    muld = aff_ref[4]
    addd = aff_ref[5]

    def lrelu(x):
        return jnp.maximum(x, 0.1 * x)

    # --- conv00 ring: rows i = r0-4 .. r0+R+3 ---
    for s00 in range(C00):
        i = r0 + s00 - 4
        # img y-taps i-3..i+3: window row of real row j is j - r0 + 7,
        # so the 7-row stack starts at (i-3) - r0 + 7 = s00 (zero-padded
        # rows supplied by the wrapper's pad).
        stacked = img_buf[slot, pl.ds(s00, 7)].reshape(56, w).astype(
            m00_ref.dtype)
        acc = jnp.zeros((16, w), f32)
        for si, s in enumerate((-2, -1, 0, 1, 2)):
            z = jax.lax.dot_general(
                m00_ref[si], stacked, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            acc = acc + shift_lane(z, s, 16)
        # rows above/below the image: conv00 itself is zero-padded at the
        # EDGE TAPS (handled by the zeroed img rows); rows fully outside
        # [0, H-1] only feed later zero-padded taps, but their BN affine
        # would make them nonzero — zero them explicitly.
        valid = jnp.logical_and(i >= 0, i <= H - 1).astype(f32)
        y = (acc * mul00 + add00) * valid
        c00_buf[s00] = lrelu(y).astype(c00_buf.dtype)

    # --- conv01 ring: rows i = r0-2 .. r0+R+1 ---
    for s01 in range(C01):
        i = r0 + s01 - 2
        # conv00 rows i-2..i+2 start at ring slot (i-2)-(r0-4) = s01
        stacked = c00_buf[pl.ds(s01, 5)].reshape(80, w)
        acc = jnp.zeros((16, w), f32)
        for si, s in enumerate((-1, 0, 1)):
            z = jax.lax.dot_general(
                m01_ref[si], stacked, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            acc = acc + shift_lane(z, s, 16)
        valid = jnp.logical_and(i >= 0, i <= H - 1).astype(f32)
        y = (acc * mul01 + add01) * valid
        out = lrelu(y)
        c01_buf[s01] = out.astype(c01_buf.dtype)
        if 2 <= s01 < R + 2:
            latt_ref[0, s01 - 2] = out.astype(latt_ref.dtype)

    # --- downsample1: even full-res rows 2o, o = r0//2 .. r0//2 + R//2 - 1 ---
    for sd in range(R // 2):
        o2 = r0 + 2 * sd  # full-res center row
        a = 2 * sd        # conv01 rows o2-2..o2+2 start at slot (o2-2)-(r0-2)
        stacked = c01_buf[pl.ds(a, 5)].reshape(80, w)
        acc = jnp.zeros((16, w), f32)
        for si, s in enumerate((-1, 0, 1)):
            z = jax.lax.dot_general(
                mdn_ref[si], stacked, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            acc = acc + shift_lane(z, s, 16)
        y = acc * muld + addd
        down_ref[0, sd] = lrelu(y).astype(down_ref.dtype)


def encoder_head(imgs, k7, aff00, k5, aff01, kd, affd):
    """(latt [N,H,16,w], down0 [N,H/2,W/2,16]) from imgs [N,H,W,3].

    k7/k5/kd: conv00 [7,7,3,8] / conv01 [5,5,8,8] / downsample1 [5,5,8,16]
    aff*: (mul, add) folded inference-BN per-channel f32 affines.
    """
    N, H, W, ci = imgs.shape
    assert ci == 3 and H % R == 0 and W % 256 == 0, (imgs.shape,)
    w = W // 2
    HB = H // R
    dt = imgs.dtype if imgs.dtype in (jnp.bfloat16, jnp.float32) else jnp.bfloat16

    # (sp, c) rows, with 8 zero rows of padding top and bottom so the
    # kernel's y-tap windows never clamp (zero rows == conv zero padding).
    imgt = jnp.transpose(
        imgs.reshape(N, H, w, 2, 3), (0, 1, 3, 4, 2)).reshape(N, H, 6, w)
    imgt = jnp.pad(imgt.astype(dt), ((0, 0), (8, 8), (0, 2), (0, 0)))

    m00 = _phase_matrices(k7, 7, 7, (0, 1), 3, 8,
                          (-2, -1, 0, 1, 2), cpad=8)    # [5, 16, 56]
    m01 = _phase_matrices(k5, 5, 5, (0, 1), 8, 8,
                          (-1, 0, 1))                   # [3, 16, 80]
    mdn = _phase_matrices(kd, 5, 5, (0,), 8, 16,
                          (-1, 0, 1))                   # [3, 16, 80]

    def tile2(v):  # per-channel [8] -> per-(phase, channel) [16]
        return jnp.concatenate([v, v]).astype(jnp.float32)

    aff = jnp.stack([
        tile2(aff00[0]), tile2(aff00[1]),
        tile2(aff01[0]), tile2(aff01[1]),
        affd[0].astype(jnp.float32), affd[1].astype(jnp.float32),
    ])[..., None]  # [6, 16, 1]

    kernel = functools.partial(_kernel, H=H, w=w, HB=HB)
    latt, down = pl.pallas_call(
        kernel,
        grid=(N, HB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((5, 16, 56), lambda n, hh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 16, 80), lambda n, hh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 16, 80), lambda n, hh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 16, 1), lambda n, hh: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, 16, w), lambda n, hh: (n, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R // 2, 16, w), lambda n, hh: (n, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, 16, w), dt),
            jax.ShapeDtypeStruct((N, H // 2, 16, w), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, IMGW, 8, w), dt),
            pltpu.VMEM((C00, 16, w), dt),
            pltpu.VMEM((C01, 16, w), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(imgt, m00.astype(dt), m01.astype(dt), mdn.astype(dt), aff)
    # (c16) rows -> NHWC half-res for the rest of the encoder
    down0 = jnp.transpose(down, (0, 1, 3, 2))  # [N, H/2, w, 16]
    return latt, down0
