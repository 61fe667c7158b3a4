"""Native backward kernel for the fused plane-sweep warp+correlation.

Completes the training-path story (DESIGN.md roadmap #5): forward is the
banded-matmul kernel (warp_corr.py), and this kernel computes BOTH feature
cotangents in one pass without ever materializing the warped volume or
running an XLA gather/scatter:

  corr[d, p, g] = (1/cg) * sum_{c in g} ref[p, c] * warped[d, p, c]
  warped[d,p,c] = sum_j wx[d,p,j] * sum_k wy[d,p,k] * src[k, j, c]

with wx/wy the bilinear tent weights (coordinates are stop_gradient, so only
ref/src carry cotangents):

  dref[p, c]   = sum_d dcex[d, p, c] * warped[d, p, c]
  dsrc[k, j, c] = sum_{d, p} wy[d,p,k] * wx[d,p,j] * ref[p,c] * dcex[d,p,c]

where dcex expands the group cotangent: dcex[., c] = dcorr[., g(c)] / cg.

Structure (v2 orientation — channels in sublanes, pixels in lanes):
- dref: recompute warped per (depth-plane, row) exactly like the forward
  (band2 [K*C, JT] @ WxT [JT, XT], K-step y-combine) and accumulate
  warped * dcex into a per-(row-block) output block that stays resident in
  VMEM while the grid sweeps depth (grid order (B, HB, ND, NXT), d inner).
- dsrc: the adjoint of the banded matmuls — build dP[k*C+c, x] =
  wy[k,x] * ref[c,x] * dcex[c,x] and contract over pixels from the right
  (dP [K*C, XT] @ WxT^T -> dband [K*C, JT]), then read-modify-write the
  K-row band window of dsrc in HBM. TPU Pallas grids execute sequentially
  on one core, so the overlapping-window accumulation is race-free; the
  zero-initialized dsrc buffer is threaded through input_output_aliases.

The adjoint uses the SAME band windows (y_start/x_start derived from px/py)
as the forward, so this is the exact VJP of the band-clipped forward — more
consistent than the XLA-recompute backward, which differentiates the
unclipped gather formulation (they agree wherever the band does not clip,
which the parity tests pin).

Replaces the warp hot path's training backward; the reference trains this
op through torch autograd's grid_sample backward (ref: models/warping.py:
69-109), a CUDA scatter with no TPU analog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvsformer_tpu.ops.pallas import warp_corr as _wc
from mvsformer_tpu.ops.pallas.warp_corr import XT, _pad_to


def _kernel_bwd(
    y_start_ref,  # scalar-prefetch [B*D*HB] i32 (band starts)
    x_start_ref,  # scalar-prefetch [B*D*HB*NXT] i32
    y_off_ref,  # scalar-prefetch [B*D*HB*NXT*ROWS] i32 (row window - band;
    #             all-zero when KR == K, i.e. full-band mode)
    px_ref,  # [1, DP, 1, ROWS, XT] f32
    py_ref,  # [1, DP, 1, ROWS, XT] f32
    ref_ref,  # [1, ROWS, C, XT] f32 (HCW tile)
    dcorr_ref,  # [1, DP, ROWS, G, XT] f32
    src_ref,  # [1, H+K, C, WSRC] f32 (HBM; manual band DMA)
    dsrc_in_ref,  # [B, H+K, C, WSRC] f32 (HBM; zeros, aliased to dsrc_ref)
    dref_ref,  # [1, ROWS, C, Wp] f32 (VMEM block, d-resident accumulator)
    dsrc_ref,  # [B, H+K, C, WSRC] f32 (HBM; RMW accumulator)
    band_ref,  # scratch [2, DP, K, C, WSRC]
    dp_buf,  # scratch [KR*C, XT]
    dband_buf,  # scratch [K*C, JT]
    rmw_buf,  # scratch [K, C, JT]
    sem,  # DMA semaphores [2, DP]
    rmw_sem,  # DMA semaphores [2] (0 = read, 1 = write)
    *,
    K: int,
    KR: int,  # per-row y-window height (== K for full-band mode)
    JT: int,
    C: int,
    G: int,
    HB: int,
    NXT: int,
    DP: int,
):
    b = pl.program_id(0)
    hb = pl.program_id(1)
    dblk = pl.program_id(2)
    xt = pl.program_id(3)
    ND = pl.num_programs(2)
    D = ND * DP

    # Band double-buffering over the (hb, dblk) step sequence (d inner, so
    # the dref output block for (b, hb) stays resident while depth sweeps).
    n_step = hb * ND + dblk
    slot = jax.lax.rem(n_step, 2)

    def dma(step_idx, slot_idx, dp):
        hh = step_idx // ND
        dd = jax.lax.rem(step_idx, ND)
        flat_row = (b * D + dd * DP + dp) * HB + hh
        y0 = y_start_ref[flat_row]
        return pltpu.make_async_copy(
            src_ref.at[b, pl.ds(y0, K)], band_ref.at[slot_idx, dp],
            sem.at[slot_idx, dp])

    @pl.when(xt == 0)
    def _():
        @pl.when(n_step == 0)
        def _():
            for dp in range(DP):
                dma(n_step, slot, dp).start()
        for dp in range(DP):
            dma(n_step, slot, dp).wait()

        @pl.when(n_step + 1 < HB * ND)
        def _():
            for dp in range(DP):
                dma(n_step + 1, 1 - slot, dp).start()

    # Zero the resident dref block at the first depth step of each (b, hb).
    @pl.when((dblk == 0) & (xt == 0))
    def _():
        dref_ref[...] = jnp.zeros_like(dref_ref)

    cg = C // G
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    gmat = ((ci // cg) == gi).astype(jnp.float32) / float(cg)  # [C, G]

    for dp in range(DP):
        flat_row = (b * D + (dblk * DP + dp)) * HB + hb
        y0 = y_start_ref[flat_row]
        x0 = pl.multiple_of(x_start_ref[flat_row * NXT + xt], 128)

        j_abs = x0.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (JT, 1), 0).astype(jnp.float32)
        kr_iota = jax.lax.broadcasted_iota(jnp.int32, (KR, 1), 0).astype(
            jnp.float32)

        dband_buf[...] = jnp.zeros_like(dband_buf)
        for r in range(_wc.ROWS):
            off = y_off_ref[(flat_row * NXT + xt) * _wc.ROWS + r]
            band_r = band_ref[slot, dp, pl.ds(off, KR), :,
                              pl.ds(x0, JT)].reshape(KR * C, JT)
            px_r = px_ref[0, dp, 0, r].reshape(1, XT)
            py_r = py_ref[0, dp, 0, r].reshape(1, XT)
            wxt = jnp.maximum(1.0 - jnp.abs(j_abs - px_r), 0.0)  # [JT, XT]
            k_abs = (y0 + off).astype(jnp.float32) + kr_iota  # [KR, 1]
            wy = jnp.maximum(1.0 - jnp.abs(k_abs - py_r), 0.0)  # [KR, XT]

            # Group-expanded cotangent for this row: [C, XT].
            dcex = jax.lax.dot_general(
                gmat, dcorr_ref[0, dp, r],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            # ---- dref: recompute warped (forward math), accumulate. ----
            p = jax.lax.dot_general(
                band_r, wxt,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [KR*C, XT]
            warped = jnp.zeros((C, XT), jnp.float32)
            for k in range(KR):
                warped = warped + wy[k:k + 1] * p[k * C:(k + 1) * C]
            col = pl.ds(xt * XT, XT)
            dref_ref[0, r, :, col] = dref_ref[0, r, :, col] + warped * dcex

            # ---- dsrc: dP[k*C+c, x] = wy[k,x] * ref[c,x] * dcex[c,x]. ----
            t = ref_ref[0, r].astype(jnp.float32) * dcex  # [C, XT]
            for k in range(KR):
                dp_buf[k * C:(k + 1) * C, :] = wy[k:k + 1] * t
            dband = jax.lax.dot_general(
                dp_buf[...], wxt,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [KR*C, JT]
            # Scatter the row's window into the block band at its offset.
            sl = pl.ds(off * C, KR * C)
            dband_buf[sl, :] = dband_buf[sl, :] + dband

        # Read-modify-write the K-row band window of dsrc. The grid runs
        # sequentially and both DMAs are waited before the next window's
        # read, so overlapping windows accumulate correctly.
        window = dsrc_ref.at[b, pl.ds(y0, K), :, pl.ds(x0, JT)]
        rd = pltpu.make_async_copy(window, rmw_buf, rmw_sem.at[0])
        rd.start()
        rd.wait()
        rmw_buf[...] = rmw_buf[...] + dband_buf[...].reshape(K, C, JT)
        wr = pltpu.make_async_copy(rmw_buf, window, rmw_sem.at[1])
        wr.start()
        wr.wait()


@functools.partial(jax.jit, static_argnames=("groups", "band_rows",
                                             "band_cols", "row_band"))
def plane_sweep_group_corr_bwd(
    ref_fea,  # [B, H, W, C] f32
    src_fea,  # [B, H, W, C] f32
    src_proj,  # [B, 4, 4] composed
    ref_proj,  # [B, 4, 4] composed
    depth_values,  # [B, D, H, W] or [B, D]
    dcorr,  # [B, D, H, W, G] f32 cotangent
    groups: int = 8,
    band_rows: int = 12,
    band_cols: int = 384,
    row_band: int | None = None,
):
    """VJP of the band-formulated fused warp+corr w.r.t. (ref_fea, src_fea).

    Returns (dref [B, H, W, C], dsrc [B, H, W, C]), both f32. Coordinates and
    depth values carry zero cotangent by construction (the reference computes
    warp coordinates under no_grad, warping.py:79).

    row_band=KR selects the v3 per-row y-window formulation (each output
    row's matmuls contract a KR-row slice of the band, ~K/KR fewer MACs) —
    the exact adjoint of plane_sweep_group_corr_v3 with the same row_band.
    None (default) is the full-band adjoint matching v1/v2 forwards.
    """
    from mvsformer_tpu.ops.geometry import plane_sweep_coords

    B, H, W, C = ref_fea.shape
    D = depth_values.shape[1]
    K, JT = band_rows + max(0, _wc.ROWS - 8), band_cols
    KR = row_band if row_band is not None else K
    assert KR <= K
    G = groups

    px, py, _ = plane_sweep_coords(
        src_proj.astype(jnp.float32), ref_proj.astype(jnp.float32),
        depth_values.astype(jnp.float32), H, W)
    px = jax.lax.stop_gradient(px).reshape(B, D, H, W)
    py = jax.lax.stop_gradient(py).reshape(B, D, H, W)

    Hp = -(-H // _wc.ROWS) * _wc.ROWS
    Wp = -(-W // XT) * XT
    HB = Hp // _wc.ROWS
    NXT = Wp // XT

    def edge_pad(x, target, axis):
        pad = target - x.shape[axis]
        if pad <= 0:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        return jnp.pad(x, cfg, mode="edge")

    pxp = edge_pad(edge_pad(px, Hp, 2), Wp, 3)
    pyp = edge_pad(edge_pad(py, Hp, 2), Wp, 3)

    max_x0 = (W // 128) * 128
    WSRC = max_x0 + JT
    src_hcw = jnp.transpose(src_fea.astype(jnp.float32), (0, 1, 3, 2))
    src_hcw = _pad_to(_pad_to(src_hcw, H + K, 1), WSRC, 3)
    ref_hcw = jnp.transpose(ref_fea.astype(jnp.float32), (0, 1, 3, 2))
    ref_hcw = _pad_to(_pad_to(ref_hcw, Hp, 1), Wp, 3)

    # Cotangent in v2 orientation [B, D, Hp, G, Wp]; zero-padded, so padded
    # pixels contribute nothing to either gradient.
    dcorr_t = jnp.transpose(dcorr.astype(jnp.float32), (0, 1, 2, 4, 3))
    dcorr_t = _pad_to(_pad_to(dcorr_t, Hp, 2), Wp, 4)

    # Same window origins as the forward kernels.
    py_blk = pyp.reshape(B, D, HB, _wc.ROWS, Wp)
    y_start = jnp.clip(
        jnp.floor(py_blk.min(axis=(3, 4))).astype(jnp.int32), 0, H)
    px_blk = pxp.reshape(B, D, HB, _wc.ROWS, NXT, XT)
    x_min = jnp.floor(px_blk.min(axis=(3, 5))).astype(jnp.int32)
    x_start = jnp.clip((x_min // 128) * 128, 0, max_x0)

    # Per-(row, x-tile) y-window offsets inside the band (v3 semantics);
    # all-zero in full-band mode so the kernel's pl.ds(off, KR) spans K.
    if KR < K:
        py_rt = pyp.reshape(B, D, HB, _wc.ROWS, NXT, XT).transpose(
            0, 1, 2, 4, 3, 5)
        y_row_min = jnp.floor(py_rt.min(axis=-1)).astype(jnp.int32)
        y_off = jnp.clip(y_row_min - y_start[:, :, :, None, None], 0, K - KR)
    else:
        y_off = jnp.zeros((B, D, HB, NXT, _wc.ROWS), jnp.int32)

    band_bytes = K * C * WSRC * 4
    DP = 1
    for cand in (4, 2):
        if D % cand == 0 and 2 * cand * band_bytes <= 12 * 1024 * 1024:
            DP = cand
            break
    grid = (B, HB, D // DP, NXT)
    kernel = functools.partial(_kernel_bwd, K=K, KR=KR, JT=JT, C=C, G=G,
                               HB=HB, NXT=NXT, DP=DP)

    px5 = pxp.reshape(B, D, HB, _wc.ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    px5 = px5.reshape(B, D, HB * NXT, _wc.ROWS, XT)
    py5 = pyp.reshape(B, D, HB, _wc.ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    py5 = py5.reshape(B, D, HB * NXT, _wc.ROWS, XT)

    dsrc_zero = jnp.zeros((B, H + K, C, WSRC), jnp.float32)

    dref_hcw, dsrc_hcw = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, DP, 1, _wc.ROWS, XT),
                             lambda b, h, d, x, *_: (b, d, h * NXT + x, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DP, 1, _wc.ROWS, XT),
                             lambda b, h, d, x, *_: (b, d, h * NXT + x, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _wc.ROWS, C, XT),
                             lambda b, h, d, x, *_: (b, h, 0, x),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DP, _wc.ROWS, G, XT),
                             lambda b, h, d, x, *_: (b, d, h, 0, x),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, _wc.ROWS, C, Wp),
                             lambda b, h, d, x, *_: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, DP, K, C, WSRC), jnp.float32),
                pltpu.VMEM((KR * C, XT), jnp.float32),
                pltpu.VMEM((K * C, JT), jnp.float32),
                pltpu.VMEM((K, C, JT), jnp.float32),
                pltpu.SemaphoreType.DMA((2, DP)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hp, C, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, H + K, C, WSRC), jnp.float32),
        ),
        # The zeros buffer (operand 8 = 3 scalar-prefetch + 5 tensor inputs)
        # is donated as the dsrc accumulator so RMW starts from zero.
        input_output_aliases={8: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(y_start.reshape(-1), x_start.reshape(-1), y_off.reshape(-1),
      px5, py5, ref_hcw, dcorr_t, src_hcw, dsrc_zero)

    dref = jnp.transpose(dref_hcw[:, :H, :, :W], (0, 1, 3, 2))
    dsrc = jnp.transpose(dsrc_hcw[:, :H, :, :W], (0, 1, 3, 2))
    return dref.astype(ref_fea.dtype), dsrc.astype(src_fea.dtype)
