"""Fused FPN top-down level as a Pallas TPU kernel.

One decoder level computes (models/fpn.py FPNDecoder; reference
models/module.py:208-302):

    intra_out = up2(intra_in) + inner(lateral)        # 64ch, 2x resolution
    out_k     = swish(BN(conv3x3(intra_out)))         # 8/16/32 ch

At the eval shape the three levels cost ~55 ms/frame in XLA — bandwidth-bound
resize shifts, 64-channel full-res adds, and layout copies on
[5, 1152, 1536, 64] tensors. This kernel runs a whole level per
(batch, row-block) grid step with everything VMEM-resident:

  * H-axis 2x upsample in EVEN/ODD PHASE SPACE — even output rows combine
    source rows (k-1, k), odd rows (k, k+1), with the per-row bilinear
    weights AND the band realignment folded into one [nk, band] selection
    matmul built from iota (Mosaic lowers neither dynamic_slice nor sublane
    rotates). The two phase planes are separate kernel outputs; XLA
    interleaves them with one cheap transpose+reshape.
  * W-axis 2x upsample as ONE dense matmul with a host-built [Ws, 2Ws]
    bilinear matrix (2 nonzeros per column) — MXU time replaces
    gather/relayout time.
  * the lateral 1x1 `inner` conv, the residual add, the 3x3 `out` conv
    (9 per-tap left-contraction dots in H-phase space), the folded BN
    affine, and swish all happen on the VMEM planes.
  * activations are bf16 with f32 matmul accumulation, matching the flax
    path's compute dtype.

Tensors between levels stay in rows-first layouts ([B, Hs, C*W]) so every
contraction is a legal 2D dot; the only in-VMEM transposes are the small
per-step channel-first flips of the phase planes.

Zero rows outside the image fall out of the construction (border upsample
weights are exactly 0, the selection matmuls zero-fill, and the inner bias
is masked), so the 3x3 conv's torch zero-padding semantics are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w_up_matrix(ws, align_corners=True):
    """[Ws, 2Ws] bilinear 2x upsample matrix (columns sum to 1)."""
    n = ws
    i = jnp.arange(2 * n, dtype=jnp.float32)
    if align_corners:
        c = i * ((n - 1) / (2 * n - 1))
    else:
        c = jnp.clip((i + 0.5) * 0.5 - 0.5, 0.0, n - 1)
    lo = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    f = c - lo.astype(jnp.float32)
    j = jnp.arange(n, dtype=jnp.int32)[:, None]
    m = (jnp.where(j == lo[None, :], 1.0 - f[None, :], 0.0)
         + jnp.where(j == lo[None, :] + 1, f[None, :], 0.0))
    return m


def _fpn_kernel(prev_hbm, lat_hbm, kin, bin_, koutT, bout, bnm, bna,
                out_ref, intra_ref, band, latband, sems, *,
                rb2, hs, ws, cx, cprev, cout, emit_intra, hb_total):
    b = pl.program_id(0)
    kb = pl.program_id(1)
    n_b = pl.num_programs(0)
    step = b * hb_total + kb
    slot = jax.lax.rem(step, 2)
    w2 = 2 * ws
    nk = rb2 + 2          # phase rows: source k in [k0-1, k0+rb2+1)
    npd = band.shape[1]   # prev band rows (8-aligned count)
    nld = latband.shape[2]

    def starts(kk):
        k0 = kk * rb2
        sp = (jnp.clip(k0 - 2, 0, hs - npd) // 8) * 8
        sl = (jnp.clip(k0 - 1, 0, hs - nld) // 8) * 8
        return sp, sl

    def dma_prev(bb, kk, sl_idx):
        sp, _ = starts(kk)
        return pltpu.make_async_copy(
            prev_hbm.at[bb, pl.ds(sp, npd), :], band.at[sl_idx],
            sems.at[sl_idx, 0])

    def dma_lat(bb, kk, sl_idx):
        _, sl = starts(kk)
        return pltpu.make_async_copy(
            lat_hbm.at[bb, :, pl.ds(sl, nld), :], latband.at[sl_idx],
            sems.at[sl_idx, 1])

    @pl.when(step == 0)
    def _():
        dma_prev(b, kb, slot).start()
        dma_lat(b, kb, slot).start()

    @pl.when(step + 1 < n_b * hb_total)
    def _():
        nstep = step + 1
        nb, nkk = nstep // hb_total, jax.lax.rem(nstep, hb_total)
        dma_prev(nb, nkk, 1 - slot).start()
        dma_lat(nb, nkk, 1 - slot).start()

    dma_prev(b, kb, slot).wait()
    dma_lat(b, kb, slot).wait()

    k0 = kb * rb2
    sp, sl = starts(kb)

    # --- prev band (already W-upsampled outside): H-phase selections ----
    # band[slot]: [npd, Cprev*W2], row p == prev row sp+p.
    pw = band[slot].astype(jnp.bfloat16)

    # Phase selections fold upsample weights + realign + borders:
    #   ye[j] = (1-be_k) prev[k] + be_k prev[k-1],  k = k0-1+j
    #   yo[j] = (1-bo_k) prev[k] + bo_k prev[k+1]
    # prev[k] lives at band row k - sp; rows outside [0, hs) get weight 0.
    jj = jax.lax.broadcasted_iota(jnp.int32, (nk, npd), 0)
    pp = jax.lax.broadcasted_iota(jnp.int32, (nk, npd), 1)
    kk = k0 - 1 + jj
    kf = kk.astype(jnp.float32)
    be = kf / float(2 * hs - 1)
    bo = (float(hs - 1) - kf) / float(2 * hs - 1)
    row_ok = (kk >= 0) & (kk < hs)

    def sel_phase(w_self, w_nbr, nbr):
        m = (jnp.where((pp == kk - sp) & row_ok, w_self, 0.0)
             + jnp.where((pp == kk + nbr - sp) & row_ok, w_nbr, 0.0))
        return m.astype(jnp.bfloat16)

    ye = jax.lax.dot_general(
        sel_phase(1.0 - be, be, -1), pw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [nk, Cprev*W2]
    yo = jax.lax.dot_general(
        sel_phase(1.0 - bo, bo, +1), pw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # --- lateral phases: realign + inner 1x1 ----------------------------
    jl = jax.lax.broadcasted_iota(jnp.int32, (nk, nld), 0)
    ql = jax.lax.broadcasted_iota(jnp.int32, (nk, nld), 1)
    kl = k0 - 1 + jl
    sel_lat = ((ql == kl - sl) & (kl >= 0) & (kl < hs)).astype(jnp.bfloat16)
    kin_b = kin[...].astype(jnp.bfloat16)   # [Cx, Cprev]
    bin_v = bin_[...]                       # [Cprev, 1] f32
    row_mask = ((kl[:, :1] >= 0) & (kl[:, :1] < hs)).astype(jnp.float32)

    planes = []
    for a, y in ((0, ye), (1, yo)):
        la = jax.lax.dot_general(
            sel_lat, latband[slot, a].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [nk, Cx*W2]
        la = la.astype(jnp.bfloat16).reshape(nk, cx, w2)
        la = la.transpose(1, 0, 2)               # [Cx, nk, W2] (small flip)
        inner = jax.lax.dot_general(
            kin_b, la.reshape(cx, nk * w2), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Cprev, nk*W2]
        inner = inner.reshape(cprev, nk, w2)
        # bias only on real rows (zero-pad semantics for the out conv)
        inner = inner + bin_v[:, :, None] * row_mask[None, :, :]
        yt = y.reshape(nk, cprev, w2).astype(jnp.bfloat16)
        yt = yt.transpose(1, 0, 2)               # [Cprev, nk, W2]
        planes.append((yt + inner.astype(jnp.bfloat16)))
    ie, io = planes

    if emit_intra:
        intra_ref[0, 0] = ie[:, 1:1 + rb2, :]
        intra_ref[1, 0] = io[:, 1:1 + rb2, :]

    # --- 3x3 out conv in H-phase space + folded BN + swish --------------
    # All-taps z matmul per phase plane (the smallconv trick, in VMEM):
    # z[(t, co), k, w] = sum_c kout[t, c, co] * plane[c, k, w]; the conv is
    # then 9 SMALL shifted z-slice adds. Doing per-tap dots instead made
    # Mosaic stack 18 [Cprev, rb2*W2] slice copies -> 48 MB VMEM OOM.
    koutT_b = koutT[...].astype(jnp.bfloat16)  # [9*Cout, Cprev]
    bnm_v, bna_v = bnm[...], bna[...]          # [Cout, 1] f32
    bout_v = bout[...]                         # [Cout, 1] f32

    def zof(plane):
        z = jax.lax.dot_general(
            koutT_b, plane.reshape(cprev, nk * w2),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z = z.astype(jnp.bfloat16).reshape(9 * cout, nk, w2)
        return jnp.pad(z, ((0, 0), (0, 0), (1, 1)))

    ze, zo = zof(ie), zof(io)
    # out row f=2k (phase 0): taps rows f-1,f,f+1 = io[k-1], ie[k], io[k]
    # out row f=2k+1 (phase 1): ie[k], io[k], ie[k+1]
    tapplan = [[(zo, -1), (ze, 0), (zo, 0)],
               [(ze, 0), (zo, 0), (ze, 1)]]
    for a in range(2):
        acc = None
        t = 0
        for dy in range(3):
            zsrc, rshift = tapplan[a][dy]
            for dx in range(3):
                term = zsrc[t * cout:(t + 1) * cout,
                            1 + rshift:1 + rshift + rb2,
                            dx:dx + w2].astype(jnp.float32)
                acc = term if acc is None else acc + term
                t += 1
        acc = (acc.reshape(cout, rb2 * w2) + bout_v) * bnm_v + bna_v
        acc = acc * jax.nn.sigmoid(acc)  # swish
        out_ref[a, 0] = acc.reshape(cout, rb2, w2).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("emit_intra", "block_rows",
                                             "interpret"))
def fpn_up_level(prev, lat2, k_inner, b_inner, k_out, b_out, bn_stats,
                 emit_intra: bool = True, block_rows: int = 8,
                 interpret: bool = False):
    """Run one FPN top-down level fused.

    prev: [B, Hs, Cprev*Ws] (rows-first; use pack_prev / the previous
    level's intra output). lat2: [B, 2, Hs, Cx*2Ws] (lateral with H rows
    phase-split; see pack_lateral). k_inner: [1,1,Cx,Cprev] flax kernel,
    b_inner: [Cprev]. k_out: [3,3,Cprev,Cout], b_out: [Cout]. bn_stats:
    (scale, bias, mean, var) each [Cout].

    Returns (out_ph, intra_ph): out_ph [2, B, Cout, Hs, 2Ws] phase planes
    (row 2k+a of the full-res output is out_ph[a,:,:,k]); intra_ph
    [2, B, Cprev, Hs, 2Ws] or None. Assemble with interleave_h*.
    """
    B, hs, cw = prev.shape
    _, _, _, cxw2 = lat2.shape
    cx = k_inner.shape[-2]
    cprev = k_inner.shape[-1]
    ws = cw // cprev
    w2 = 2 * ws
    cout = k_out.shape[-1]
    rb2 = block_rows
    npd = -(-(rb2 + 4 + 7) // 8) * 8
    nld = -(-(rb2 + 2 + 7) // 8) * 8
    assert hs % 8 == 0 and hs >= max(npd, nld) and hs % rb2 == 0, (hs, rb2)

    scale, bias, mean, var = [a.astype(jnp.float32) for a in bn_stats]
    inv = jax.lax.rsqrt(var + 1e-5)
    bnm = (scale * inv).reshape(-1, 1)
    bna = (bias - mean * scale * inv).reshape(-1, 1)

    # W-upsample prev OUTSIDE the kernel: one efficient XLA matmul; doing
    # it in-kernel kept a [npd, Cprev*W2] f32 transient that pushed the
    # stack past the 16 MB scoped-VMEM limit.
    wup = _w_up_matrix(ws).astype(jnp.bfloat16)
    prev = jax.lax.dot_general(
        prev.astype(jnp.bfloat16).reshape(B * hs * cprev, ws), wup,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16) \
        .reshape(B, hs, cprev * w2)
    kin = k_inner.reshape(cx, cprev)
    koutT = k_out.reshape(9, cprev, cout).transpose(0, 2, 1) \
        .reshape(9 * cout, cprev)
    binv = b_inner.astype(jnp.float32).reshape(-1, 1)
    boutv = b_out.astype(jnp.float32).reshape(-1, 1)

    hb_total = hs // rb2
    grid = (B, hb_total)
    small = pl.BlockSpec(memory_space=pltpu.VMEM)
    if not interpret:
        prev = pltpu.with_memory_space_constraint(prev,
                                                  pltpu.MemorySpace.HBM)
        lat2 = pltpu.with_memory_space_constraint(lat2,
                                                  pltpu.MemorySpace.HBM)

    out_shapes = [jax.ShapeDtypeStruct((2, B, cout, hs, w2), jnp.bfloat16),
                  jax.ShapeDtypeStruct(
                      (2, B, cprev, hs, w2) if emit_intra
                      else (2, 1, 1, 1, 1), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((2, 1, cout, rb2, w2),
                              lambda b, k: (0, b, 0, k, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((2, 1, cprev, rb2, w2),
                              lambda b, k: (0, b, 0, k, 0),
                              memory_space=pltpu.VMEM)
                 if emit_intra else
                 pl.BlockSpec((2, 1, 1, 1, 1),
                              lambda b, k: (0, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)]

    outs = pl.pallas_call(
        functools.partial(_fpn_kernel, rb2=rb2, hs=hs, ws=ws, cx=cx,
                          cprev=cprev, cout=cout, emit_intra=emit_intra,
                          hb_total=hb_total),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            small, small, small, small, small, small,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, npd, cprev * w2), prev.dtype),
            pltpu.VMEM((2, 2, nld, cxw2), lat2.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(prev, lat2, kin, binv, koutT, boutv, bnm, bna)
    return outs[0], (outs[1] if emit_intra else None)


def pack_prev(x_nhwc):
    """[B, Hs, Ws, C] NHWC -> [B, Hs, C*Ws] rows-first."""
    B, H, W, C = x_nhwc.shape
    return x_nhwc.transpose(0, 1, 3, 2).reshape(B, H, C * W)


def pack_lateral(lat_nhwc):
    """[B, H, W, Cx] NHWC -> [B, 2, H/2, Cx*W] (H rows phase-split)."""
    B, H, W, C = lat_nhwc.shape
    x = lat_nhwc.reshape(B, H // 2, 2, W, C)
    return x.transpose(0, 2, 1, 4, 3).reshape(B, 2, H // 2, C * W)


def phases_to_prev(phases):
    """[2, B, C, Hs, W] kernel output -> [B, 2Hs, C*W] rows-first input
    for the NEXT level (interleaves the H phases)."""
    two, B, C, hs, W = phases.shape
    x = phases.transpose(1, 3, 0, 2, 4)  # [B, Hs, 2, C, W]
    return x.reshape(B, 2 * hs, C * W)


def interleave_h(phases):
    """[2, B, C, Hs, W] -> [B, 2Hs, W, C] NHWC."""
    two, B, C, hs, W = phases.shape
    x = phases.transpose(1, 3, 0, 4, 2)  # [B, Hs, 2, W, C]
    return x.reshape(B, 2 * hs, W, C)
