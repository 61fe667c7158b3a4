"""Fused plane-sweep warp + group-wise correlation as a Pallas TPU kernel.

Why: the XLA path (mvsformer_tpu/ops/geometry.homo_warp +
correlation.groupwise_correlation) is 4 per-pixel gathers — TPU gathers are
element-rate-bound (~160M taps/s measured on v5e), making the warp ~80-90% of
eval frame time. This kernel eliminates gathers entirely:

  out[x, c]  = sum_j  relu(1 - |px(x) - j|) * ( sum_k relu(1 - |py(x) - k|) * src[k, j, c] )

i.e. bilinear sampling == multiplying by two tent-kernel interpolation
matrices. The x-pass runs on the MXU as a banded matmul (for a 128-wide
output tile, px spans a ~JT-wide source window, so only one [RX, JT] weight
block is needed); the y-pass is a K-row weighted combine on the VPU. The
warped feature row never exists in HBM — it is correlated with the reference
row in-register and only the [.., G]-group correlation leaves the kernel.

Band semantics: each (depth, row-block) step DMAs a K-row full-width source
band into VMEM once (amortized over the row's x-tiles); each x-tile uses a
JT-wide 128-aligned window of it. Taps outside the window get zero weight —
the same zero-padding grid_sample uses for out-of-image taps
(warping.py:105-106) — and pixels whose bilinear support is not fully inside
the window are reported in the `oob` mask (ORed into the frustum mask by the
caller; for standard MVS geometry these are pixels the frustum mask kills
anyway). px/py arrive pre-transposed as [RX, 1] sublane columns so the kernel
does no lane->sublane relayouts.

Forward-only: training keeps the XLA path (exact VJP); inference calls this
kernel from StageNet when `use_fused_warp` is on.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output rows per grid step (sublane tile). Grid-step fixed overhead
# (~2-3us: scalar loads, window slicing, pipeline bubbles) dominates the
# per-call time at production shapes, so bigger blocks amortize it; the
# band row count scales with ROWS in each wrapper to keep coverage.
# ModelConfig.warp_rows is the source of truth (applied by build_model via
# configure()); a SET MVSTPU_WARP_ROWS env var wins, matching the other
# kernel-routing knobs (config.py). Module global (not a function arg)
# because it shapes every BlockSpec/scratch allocation across fwd+bwd and
# is read at trace time.
ROWS = int(os.environ.get("MVSTPU_WARP_ROWS", "8"))
XT = 128  # output columns per grid step (lane tile)


def configure(rows=None):
    """Apply ModelConfig.warp_rows; env MVSTPU_WARP_ROWS overrides."""
    global ROWS
    env = os.environ.get("MVSTPU_WARP_ROWS")
    if env is not None:
        ROWS = int(env)
    elif rows is not None:
        ROWS = int(rows)


# DMA-wall experiment (VERDICT r3 #3): in-model Pallas kernels run far below
# their isolated bandwidth, and jit-CONSTANT operands reproduce the same
# degradation in isolation. MVSTPU_KERNEL_BARRIER=1 passes EVERY kernel
# operand through jax.lax.optimization_barrier immediately before the
# pallas_call (measured: pathological — the XLA compile never finished inside
# a 35-minute budget); =2 barriers only the SMALL operands (scalar-prefetch
# index arrays, folded-BN affines) — the jit-constant-foldable kind the
# round-3 isolation experiment implicated — leaving the big tensors on XLA's
# normal schedule.
_KERNEL_BARRIER = os.environ.get("MVSTPU_KERNEL_BARRIER", "0")


def _barrier(*ops):
    if _KERNEL_BARRIER == "1":
        return jax.lax.optimization_barrier(ops)
    return ops


def _barrier_small(*ops):
    if _KERNEL_BARRIER in ("1", "2"):
        return jax.lax.optimization_barrier(ops)
    return ops


def _kernel(
    y_start_ref,  # scalar-prefetch [B*D*HB] i32
    x_start_ref,  # scalar-prefetch [B*D*HB*NXT] i32
    pxt_ref,  # [1, DP, 1, 1, RX] f32 (tile-flattened lanes)
    pyt_ref,  # [1, DP, 1, 1, RX] f32
    ref_ref,  # [1, ROWS, XT, C]
    src_ref,  # [1, H+K, C, WSRC] (HBM; manual DMA)
    out_ref,  # [1, DP, ROWS, XT, G] f32
    band_ref,  # scratch [DP, K, C, WSRC]
    sem,  # DMA semaphores [DP]
    *,
    K: int,
    JT: int,
    C: int,
    G: int,
    HB: int,
    NXT: int,
    DP: int,
):
    b = pl.program_id(0)
    dblk = pl.program_id(1)
    hb = pl.program_id(2)
    xt = pl.program_id(3)
    NDBLK = pl.num_programs(1)
    D = NDBLK * DP

    # Band DMAs are double-buffered across (d-block, row-block) steps: while
    # the x-tiles of step n compute from slot n%2, the bands for step n+1
    # stream into slot (n+1)%2. DP depth planes share a grid step to amortize
    # fixed per-step costs.
    n_step = dblk * HB + hb
    slot = jax.lax.rem(n_step, 2)

    def issue(step_idx, slot_idx):
        dd = step_idx // HB
        hh = jax.lax.rem(step_idx, HB)
        for dp in range(DP):
            flat_row = (b * D + dd * DP + dp) * HB + hh
            y0 = y_start_ref[flat_row]
            pltpu.make_async_copy(
                src_ref.at[b, pl.ds(y0, K)],
                band_ref.at[slot_idx, dp],
                sem.at[slot_idx, dp],
            ).start()

    def wait(step_idx, slot_idx):
        dd = step_idx // HB
        hh = jax.lax.rem(step_idx, HB)
        for dp in range(DP):
            flat_row = (b * D + dd * DP + dp) * HB + hh
            y0 = y_start_ref[flat_row]
            pltpu.make_async_copy(
                src_ref.at[b, pl.ds(y0, K)],
                band_ref.at[slot_idx, dp],
                sem.at[slot_idx, dp],
            ).wait()

    @pl.when(xt == 0)
    def _():
        @pl.when(n_step == 0)
        def _():
            issue(n_step, slot)
        wait(n_step, slot)

        @pl.when(n_step + 1 < NDBLK * HB)
        def _():
            issue(n_step + 1, 1 - slot)

    cg = C // G
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    gmat = ((ci // cg) == gi).astype(jnp.float32) / float(cg)
    refblk = ref_ref[0].reshape(ROWS * XT, C).astype(jnp.float32)

    for dp in range(DP):
        flat_row = (b * D + dblk * DP + dp) * HB + hb
        y0 = y_start_ref[flat_row]
        x0 = pl.multiple_of(x_start_ref[flat_row * NXT + xt], 128)

        # One lane->sublane relayout per array (a [1,RX] transpose); storing
        # columns directly would cost 16x HBM padding on the input.
        pxf = pxt_ref[0, dp, 0].reshape(1, -1).T  # [RX, 1]
        pyf = pyt_ref[0, dp, 0].reshape(1, -1).T

        j_abs = x0.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (1, JT), 1).astype(jnp.float32)
        k_abs = y0.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (1, K), 1).astype(jnp.float32)

        band = band_ref[slot, dp, :, :, pl.ds(x0, JT)].reshape(K * C, JT)

        # x-interpolation for the whole row-block as ONE MXU matmul. When the
        # band is bf16, the tent weights are quantized to bf16 too (native-MXU
        # path; ~2^-8 relative weight error) with fp32 accumulation.
        wx = jnp.maximum(1.0 - jnp.abs(pxf - j_abs), 0.0).astype(band.dtype)
        p = jax.lax.dot_general(
            wx, band,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [RX, K*C]
        # y-combine on the VPU.
        wy = jnp.maximum(1.0 - jnp.abs(pyf - k_abs), 0.0)  # [RX, K]
        warped = jnp.zeros((ROWS * XT, C), jnp.float32)
        for k in range(K):
            warped = warped + wy[:, k:k + 1] * p[:, k * C:(k + 1) * C]
        corr = jnp.dot(refblk * warped, gmat,
                       preferred_element_type=jnp.float32)  # [RX, G]
        out_ref[0, dp] = corr.reshape(ROWS, XT, G)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.jit, static_argnames=("groups", "band_rows", "band_cols",
                                             "want_invalid", "bf16_band"))
def plane_sweep_group_corr(
    ref_fea,  # [B, H, W, C]
    src_fea,  # [B, H, W, C]
    src_proj,  # [B, 4, 4] composed
    ref_proj,  # [B, 4, 4] composed
    depth_values,  # [B, D, H, W] or [B, D]
    groups: int = 8,
    band_rows: int = 12,
    band_cols: int = 384,
    want_invalid: bool = True,
    bf16_band: bool = False,
):
    """Fused warp + G-group correlation for ONE source view.

    Returns (corr [B, D, H, W, G] f32, invalid [B, D, H, W] bool) matching
    groupwise_correlation(homo_warp(...)) up to the band semantics above.
    With want_invalid=False the mask is skipped entirely (returns None) —
    the cnn fusion mode never reads it, and dropping it lets XLA DCE the
    full-volume coordinate bookkeeping (significant HBM at eval shapes).
    """
    from mvsformer_tpu.ops.geometry import plane_sweep_coords

    B, H, W, C = ref_fea.shape
    D = depth_values.shape[1]
    K, JT = band_rows + max(0, ROWS - 8), band_cols
    G = groups

    px, py, invalid = plane_sweep_coords(
        src_proj.astype(jnp.float32), ref_proj.astype(jnp.float32),
        depth_values.astype(jnp.float32), H, W)
    px = jax.lax.stop_gradient(px).reshape(B, D, H, W)
    py = jax.lax.stop_gradient(py).reshape(B, D, H, W)

    # Pad spatial dims to tile multiples. px/py are EDGE-padded so the padded
    # lanes don't drag the per-tile window minima to zero.
    Hp = -(-H // ROWS) * ROWS
    Wp = -(-W // XT) * XT
    HB = Hp // ROWS
    NXT = Wp // XT
    RX = ROWS * XT

    def edge_pad(x, target, axis):
        pad = target - x.shape[axis]
        if pad <= 0:
            return x
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        return jnp.pad(x, cfg, mode="edge")

    pxp = edge_pad(edge_pad(px, Hp, 2), Wp, 3)
    pyp = edge_pad(edge_pad(py, Hp, 2), Wp, 3)
    refp = _pad_to(_pad_to(ref_fea, Hp, 1), Wp, 2)

    # Per-(hb, xt)-tile flattened coordinates: [B, D, HB*NXT, 1, RX] with
    # rx = r*XT + x (dense lanes; no HBM padding).
    def to_cols(a):
        a = a.reshape(B, D, HB, ROWS, NXT, XT)
        a = a.transpose(0, 1, 2, 4, 3, 5)  # [B, D, HB, NXT, ROWS, XT]
        return a.reshape(B, D, HB * NXT, 1, RX)

    pxt = to_cols(pxp)
    pyt = to_cols(pyp)

    # Source in [B, H, C, W]: band DMA lands as [K, C, WSRC]; per-tile windows
    # are 128-aligned lane slices of the in-VMEM band.
    max_x0 = (W // 128) * 128
    WSRC = max_x0 + JT
    if bf16_band:
        src_fea = src_fea.astype(jnp.bfloat16)
    src_hcw = jnp.transpose(src_fea, (0, 1, 3, 2))  # [B, H, C, W]
    src_hcw = _pad_to(_pad_to(src_hcw, H + K, 1), WSRC, 3)

    # Window origins.
    py_blk = pyp.reshape(B, D, HB, ROWS, Wp)
    y_min = jnp.floor(py_blk.min(axis=(3, 4))).astype(jnp.int32)
    y_start = jnp.clip(y_min, 0, H)
    px_blk = pxp.reshape(B, D, HB, ROWS, NXT, XT)
    x_min = jnp.floor(px_blk.min(axis=(3, 5))).astype(jnp.int32)
    x_start = jnp.clip((x_min // 128) * 128, 0, max_x0)

    if want_invalid:
        # Out-of-band support -> invalid (band covers floor(p)..floor(p)+1).
        y_hi = y_start.astype(jnp.float32)[:, :, :, None, None] + (K - 1)
        y_lo = y_start.astype(jnp.float32)[:, :, :, None, None]
        oob_y = (py_blk < y_lo) | (py_blk > y_hi)
        oob_y = oob_y.reshape(B, D, Hp, Wp)[:, :, :H, :W]
        x_hi = x_start.astype(jnp.float32)[:, :, :, None, :, None] + (JT - 1)
        x_lo = x_start.astype(jnp.float32)[:, :, :, None, :, None]
        oob_x = (px_blk < x_lo) | (px_blk > x_hi)
        oob_x = oob_x.reshape(B, D, Hp, Wp)[:, :, :H, :W]
        invalid = invalid | oob_x | oob_y
    else:
        invalid = None

    # Depth planes per grid step: amortizes fixed per-step costs; bounded by
    # a VMEM budget for the DP band slots.
    band_bytes = K * C * WSRC * (2 if bf16_band else 4)
    DP = 1
    for cand in (4, 2):
        if D % cand == 0 and cand * band_bytes <= 6 * 1024 * 1024:
            DP = cand
            break
    grid = (B, D // DP, HB, NXT)
    kernel = functools.partial(_kernel, K=K, JT=JT, C=C, G=G, HB=HB, NXT=NXT,
                               DP=DP)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, DP, 1, 1, RX),
                             lambda b, d, h, x, *_: (b, d, h * NXT + x, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DP, 1, 1, RX),
                             lambda b, d, h, x, *_: (b, d, h * NXT + x, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ROWS, XT, C),
                             lambda b, d, h, x, *_: (b, h, x, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, DP, ROWS, XT, G),
                                   lambda b, d, h, x, *_: (b, d, h, x, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, DP, K, C, WSRC), src_fea.dtype),
                pltpu.SemaphoreType.DMA((2, DP)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, Hp, Wp, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
            # Stage-1 shapes (C=64, K=16) need ~18MB of scoped VMEM (band +
            # interp blocks + pipeline buffers); raise the default 16MB cap.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(y_start.reshape(-1), x_start.reshape(-1), pxt, pyt,
      refp.astype(src_fea.dtype), src_hcw)

    return out[:, :, :H, :W], invalid


# ---------------------------------------------------------------------------
# v2 orientation: channels-in-sublanes, pixels-in-lanes — transpose-free.
#
# The v1 kernel spends a large fixed cost per depth-plane on [1,RX] lane->
# sublane relayouts of the coordinate vectors (they must sit in sublanes to be
# the matmul's M dim). v2 flips the contraction: W^T [JT, XT] is built with
# px kept in LANES (j iota runs along sublanes), the band contracts from the
# left (band2 [K*C, JT] @ WxT -> P [K*C, XT]), the reference arrives
# pre-transposed in HCW like the source, and the output is emitted as
# [B, D, H, G, W] with a single XLA transpose at the end.
# ---------------------------------------------------------------------------


def _kernel_v2(
    y_start_ref,  # scalar-prefetch [B*D*HB] i32
    x_start_ref,  # scalar-prefetch [B*D*HB*NXT] i32
    px_ref,  # [1, DP, ROWS, XT] f32
    py_ref,  # [1, DP, ROWS, XT] f32
    ref_ref,  # [1, ROWS, C, XT] (HCW tile)
    src_ref,  # [1, H+K, C, WSRC] (HBM; manual DMA)
    out_ref,  # [1, DP, ROWS, G, XT] f32
    band_ref,  # scratch [2, DP, K, C, WSRC]
    sem,  # DMA semaphores [2, DP]
    *,
    K: int,
    JT: int,
    C: int,
    G: int,
    HB: int,
    NXT: int,
    DP: int,
):
    b = pl.program_id(0)
    dblk = pl.program_id(1)
    hb = pl.program_id(2)
    xt = pl.program_id(3)
    NDBLK = pl.num_programs(1)
    D = NDBLK * DP

    n_step = dblk * HB + hb
    slot = jax.lax.rem(n_step, 2)

    def dma(step_idx, slot_idx, dp):
        dd = step_idx // HB
        hh = jax.lax.rem(step_idx, HB)
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

        @pl.when(n_step + 1 < NDBLK * HB)
        def _():
            for dp in range(DP):
                dma(n_step + 1, 1 - slot, dp).start()

    cg = C // G
    gi = jax.lax.broadcasted_iota(jnp.int32, (G, C), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
    gmat_t = ((ci // cg) == gi).astype(jnp.float32) / float(cg)  # [G, C]

    for dp in range(DP):
        flat_row = (b * D + dblk * DP + dp) * HB + hb
        y0 = y_start_ref[flat_row]
        x0 = pl.multiple_of(x_start_ref[flat_row * NXT + xt], 128)

        j_abs = x0.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (JT, 1), 0).astype(jnp.float32)
        k_abs = y0.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (K, 1), 0).astype(jnp.float32)

        band2 = band_ref[slot, dp, :, :, pl.ds(x0, JT)].reshape(K * C, JT)

        for r in range(ROWS):
            px_r = px_ref[0, dp, 0, r].reshape(1, XT)
            py_r = py_ref[0, dp, 0, r].reshape(1, XT)
            wxt = jnp.maximum(1.0 - jnp.abs(j_abs - px_r), 0.0)  # [JT, XT]
            p = jax.lax.dot_general(
                band2, wxt.astype(band2.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [K*C, XT]
            wy = jnp.maximum(1.0 - jnp.abs(k_abs - py_r), 0.0)  # [K, XT]
            warped = jnp.zeros((C, XT), jnp.float32)
            for k in range(K):
                warped = warped + wy[k:k + 1] * p[k * C:(k + 1) * C]
            prod = ref_ref[0, r].astype(jnp.float32) * warped  # [C, XT]
            corr = jax.lax.dot_general(
                gmat_t, prod,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, XT]
            out_ref[0, dp, r] = corr


@functools.partial(jax.jit, static_argnames=("groups", "band_rows", "band_cols",
                                             "want_invalid", "bf16_band"))
def plane_sweep_group_corr_v2(
    ref_fea,  # [B, H, W, C]
    src_fea,  # [B, H, W, C]
    src_proj,  # [B, 4, 4] composed
    ref_proj,  # [B, 4, 4] composed
    depth_values,  # [B, D, H, W] or [B, D]
    groups: int = 8,
    band_rows: int = 12,
    band_cols: int = 384,
    want_invalid: bool = True,
    bf16_band: bool = False,
):
    """Transpose-free variant of plane_sweep_group_corr (same contract)."""
    from mvsformer_tpu.ops.geometry import plane_sweep_coords

    B, H, W, C = ref_fea.shape
    D = depth_values.shape[1]
    K, JT = band_rows + max(0, ROWS - 8), band_cols
    G = groups

    px, py, invalid = plane_sweep_coords(
        src_proj.astype(jnp.float32), ref_proj.astype(jnp.float32),
        depth_values.astype(jnp.float32), H, W)
    px = jax.lax.stop_gradient(px).reshape(B, D, H, W)
    py = jax.lax.stop_gradient(py).reshape(B, D, H, W)

    Hp = -(-H // ROWS) * ROWS
    Wp = -(-W // XT) * XT
    HB = Hp // ROWS
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

    if bf16_band:
        src_fea = src_fea.astype(jnp.bfloat16)
        ref_fea = ref_fea.astype(jnp.bfloat16)
    max_x0 = (W // 128) * 128
    WSRC = max_x0 + JT
    src_hcw = jnp.transpose(src_fea, (0, 1, 3, 2))  # [B, H, C, W]
    src_hcw = _pad_to(_pad_to(src_hcw, H + K, 1), WSRC, 3)
    ref_hcw = jnp.transpose(ref_fea, (0, 1, 3, 2))
    ref_hcw = _pad_to(_pad_to(ref_hcw, Hp, 1), Wp, 3)

    py_blk = pyp.reshape(B, D, HB, ROWS, Wp)
    y_min = jnp.floor(py_blk.min(axis=(3, 4))).astype(jnp.int32)
    y_start = jnp.clip(y_min, 0, H)
    px_blk = pxp.reshape(B, D, HB, ROWS, NXT, XT)
    x_min = jnp.floor(px_blk.min(axis=(3, 5))).astype(jnp.int32)
    x_start = jnp.clip((x_min // 128) * 128, 0, max_x0)

    if want_invalid:
        y_hi = y_start.astype(jnp.float32)[:, :, :, None, None] + (K - 1)
        y_lo = y_start.astype(jnp.float32)[:, :, :, None, None]
        oob_y = (py_blk < y_lo) | (py_blk > y_hi)
        oob_y = oob_y.reshape(B, D, Hp, Wp)[:, :, :H, :W]
        x_hi = x_start.astype(jnp.float32)[:, :, :, None, :, None] + (JT - 1)
        x_lo = x_start.astype(jnp.float32)[:, :, :, None, :, None]
        oob_x = (px_blk < x_lo) | (px_blk > x_hi)
        oob_x = oob_x.reshape(B, D, Hp, Wp)[:, :, :H, :W]
        invalid = invalid | oob_x | oob_y
    else:
        invalid = None

    band_bytes = K * C * WSRC * (2 if bf16_band else 4)
    DP = 1
    for cand in (4, 2):
        if D % cand == 0 and 2 * cand * band_bytes <= 12 * 1024 * 1024:
            DP = cand
            break
    grid = (B, D // DP, HB, NXT)
    kernel = functools.partial(_kernel_v2, K=K, JT=JT, C=C, G=G, HB=HB,
                               NXT=NXT, DP=DP)

    # px/py tiles in their natural [.., ROWS, XT] layout (lanes = x).
    px5 = pxp.reshape(B, D, HB, ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    px5 = px5.reshape(B, D, HB * NXT, ROWS, XT)
    py5 = pyp.reshape(B, D, HB, ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    py5 = py5.reshape(B, D, HB * NXT, ROWS, XT)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, DP, 1, ROWS, XT),
                             lambda b, d, h, x, *_: (b, d, h * NXT + x, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DP, 1, ROWS, XT),
                             lambda b, d, h, x, *_: (b, d, h * NXT + x, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ROWS, C, XT),
                             lambda b, d, h, x, *_: (b, h, 0, x),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, DP, ROWS, G, XT),
                                   lambda b, d, h, x, *_: (b, d, h, 0, x),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, DP, K, C, WSRC), src_fea.dtype),
                pltpu.SemaphoreType.DMA((2, DP)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, Hp, G, Wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(y_start.reshape(-1), x_start.reshape(-1), px5, py5, ref_hcw, src_hcw)

    out = jnp.transpose(out[:, :, :H, :, :W], (0, 1, 2, 4, 3))
    return out, invalid


# ---------------------------------------------------------------------------
# v3: v2 orientation + PER-ROW y-windows (DESIGN.md roadmap #3).
#
# v1/v2 contract a K-row band per 8-row block, forcing K >= ROWS+1+tilt (~12)
# even though each output row's bilinear support is only 2 source rows
# (+epipolar tilt across the 128-lane tile). v3 keeps the block-level band DMA
# (amortized HBM traffic) but slices a KR-row (default 4) per-row window out
# of the in-VMEM band for the x-matmul: [KR*C, JT] @ [JT, XT] — KR/K ~ 3x
# fewer MACs — and a KR-step y-combine. Per-row window starts are
# scalar-prefetched ([B*D*HB*NXT*ROWS] i32, host-clamped into the band).
# ---------------------------------------------------------------------------


def _kernel_v3(
    y_start_ref,  # scalar-prefetch [B*D*HB] i32 (band starts)
    x_start_ref,  # scalar-prefetch [B*D*HB*NXT] i32
    y_off_ref,  # scalar-prefetch [B*D*HB*NXT*ROWS] i32 (row window - band)
    px_ref,  # [1, DP, 1, ROWS, XT] f32
    py_ref,  # [1, DP, 1, ROWS, XT] f32
    ref_ref,  # [1, ROWS, C, XT] (HCW tile)
    src_ref,  # [1, H+K, C, WSRC] (HBM; manual DMA)
    out_ref,  # [1, DP, ROWS, G, XT] f32
    band_ref,  # scratch [2, DP, K, C, WSRC]
    sem,  # DMA semaphores [2, DP]
    *,
    K: int,
    KR: int,
    JT: int,
    C: int,
    G: int,
    HB: int,
    NXT: int,
    DP: int,
):
    b = pl.program_id(0)
    dblk = pl.program_id(1)
    hb = pl.program_id(2)
    xt = pl.program_id(3)
    NDBLK = pl.num_programs(1)
    D = NDBLK * DP

    n_step = dblk * HB + hb
    slot = jax.lax.rem(n_step, 2)

    def dma(step_idx, slot_idx, dp):
        dd = step_idx // HB
        hh = jax.lax.rem(step_idx, HB)
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

        @pl.when(n_step + 1 < NDBLK * HB)
        def _():
            for dp in range(DP):
                dma(n_step + 1, 1 - slot, dp).start()

    cg = C // G
    gi = jax.lax.broadcasted_iota(jnp.int32, (G, C), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
    gmat_t = ((ci // cg) == gi).astype(jnp.float32) / float(cg)  # [G, C]

    for dp in range(DP):
        flat_row = (b * D + dblk * DP + dp) * HB + hb
        y0 = y_start_ref[flat_row]
        x0 = pl.multiple_of(x_start_ref[flat_row * NXT + xt], 128)

        j_abs = x0.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (JT, 1), 0).astype(jnp.float32)
        kr_iota = jax.lax.broadcasted_iota(jnp.int32, (KR, 1), 0).astype(
            jnp.float32)

        for r in range(ROWS):
            off = y_off_ref[(flat_row * NXT + xt) * ROWS + r]
            band_r = band_ref[slot, dp, pl.ds(off, KR), :,
                              pl.ds(x0, JT)].reshape(KR * C, JT)
            px_r = px_ref[0, dp, 0, r].reshape(1, XT)
            py_r = py_ref[0, dp, 0, r].reshape(1, XT)
            wxt = jnp.maximum(1.0 - jnp.abs(j_abs - px_r), 0.0)  # [JT, XT]
            p = jax.lax.dot_general(
                band_r, wxt.astype(band_r.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [KR*C, XT]
            k_abs = (y0 + off).astype(jnp.float32) + kr_iota  # [KR, 1]
            wy = jnp.maximum(1.0 - jnp.abs(k_abs - py_r), 0.0)  # [KR, XT]
            warped = jnp.zeros((C, XT), jnp.float32)
            for k in range(KR):
                warped = warped + wy[k:k + 1] * p[k * C:(k + 1) * C]
            prod = ref_ref[0, r].astype(jnp.float32) * warped  # [C, XT]
            corr = jax.lax.dot_general(
                gmat_t, prod,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, XT]
            out_ref[0, dp, r] = corr.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "band_rows", "band_cols",
                                             "row_band", "want_invalid",
                                             "bf16_band", "out_dtype"))
def plane_sweep_group_corr_v3(
    ref_fea,  # [B, H, W, C]
    src_fea,  # [B, H, W, C]
    src_proj,  # [B, 4, 4] composed
    ref_proj,  # [B, 4, 4] composed
    depth_values,  # [B, D, H, W] or [B, D]
    groups: int = 8,
    band_rows: int = 12,
    band_cols: int = 384,
    row_band: int = 4,
    want_invalid: bool = True,
    bf16_band: bool = False,
    out_dtype=jnp.float32,
):
    """Per-row-windowed variant of plane_sweep_group_corr_v2 (same contract).

    row_band KR bounds each output row's y support (2 bilinear taps +
    epipolar tilt across one 128-lane tile); rows whose support exceeds the
    window are flagged invalid like the other band clips."""
    from mvsformer_tpu.ops.geometry import plane_sweep_coords

    B, H, W, C = ref_fea.shape
    D = depth_values.shape[1]
    K, JT, KR = band_rows + max(0, ROWS - 8), band_cols, row_band
    assert KR <= K
    G = groups

    px, py, invalid = plane_sweep_coords(
        src_proj.astype(jnp.float32), ref_proj.astype(jnp.float32),
        depth_values.astype(jnp.float32), H, W)
    px = jax.lax.stop_gradient(px).reshape(B, D, H, W)
    py = jax.lax.stop_gradient(py).reshape(B, D, H, W)

    Hp = -(-H // ROWS) * ROWS
    Wp = -(-W // XT) * XT
    HB = Hp // ROWS
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

    if bf16_band:
        src_fea = src_fea.astype(jnp.bfloat16)
        ref_fea = ref_fea.astype(jnp.bfloat16)
    max_x0 = (W // 128) * 128
    WSRC = max_x0 + JT
    src_hcw = jnp.transpose(src_fea, (0, 1, 3, 2))  # [B, H, C, W]
    src_hcw = _pad_to(_pad_to(src_hcw, H + K, 1), WSRC, 3)
    ref_hcw = jnp.transpose(ref_fea, (0, 1, 3, 2))
    ref_hcw = _pad_to(_pad_to(ref_hcw, Hp, 1), Wp, 3)

    py_blk = pyp.reshape(B, D, HB, ROWS, Wp)
    y_min = jnp.floor(py_blk.min(axis=(3, 4))).astype(jnp.int32)
    y_start = jnp.clip(y_min, 0, H)
    px_blk = pxp.reshape(B, D, HB, ROWS, NXT, XT)
    x_min = jnp.floor(px_blk.min(axis=(3, 5))).astype(jnp.int32)
    x_start = jnp.clip((x_min // 128) * 128, 0, max_x0)

    # Per-(row, x-tile) y windows inside the band: [B, D, HB, NXT, ROWS].
    py_rt = pyp.reshape(B, D, HB, ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    y_row_min = jnp.floor(py_rt.min(axis=-1)).astype(jnp.int32)
    y_off = jnp.clip(y_row_min - y_start[:, :, :, None, None], 0, K - KR)
    y_row_start = y_start[:, :, :, None, None] + y_off

    if want_invalid:
        # Support must fit the per-row window [y_row_start, +KR-1] and the
        # x window (same as v1/v2).
        y_lo = y_row_start.astype(jnp.float32)[..., None]
        oob_y = (py_rt < y_lo) | (py_rt > y_lo + (KR - 1))
        oob_y = oob_y.transpose(0, 1, 2, 4, 3, 5).reshape(B, D, Hp, Wp)[:, :, :H, :W]
        x_hi = x_start.astype(jnp.float32)[:, :, :, None, :, None] + (JT - 1)
        x_lo = x_start.astype(jnp.float32)[:, :, :, None, :, None]
        oob_x = (px_blk < x_lo) | (px_blk > x_hi)
        oob_x = oob_x.reshape(B, D, Hp, Wp)[:, :, :H, :W]
        invalid = invalid | oob_x | oob_y
    else:
        invalid = None

    band_bytes = K * C * WSRC * (2 if bf16_band else 4)
    DP = 1
    for cand in (4, 2):
        if D % cand == 0 and 2 * cand * band_bytes <= 12 * 1024 * 1024:
            DP = cand
            break
    grid = (B, D // DP, HB, NXT)
    kernel = functools.partial(_kernel_v3, K=K, KR=KR, JT=JT, C=C, G=G, HB=HB,
                               NXT=NXT, DP=DP)

    px5 = pxp.reshape(B, D, HB, ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    px5 = px5.reshape(B, D, HB * NXT, ROWS, XT)
    py5 = pyp.reshape(B, D, HB, ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    py5 = py5.reshape(B, D, HB * NXT, ROWS, XT)
    # y_off flat index: (((b*D+d)*HB+h)*NXT+x)*ROWS+r.
    y_off_flat = y_off.reshape(-1)  # already (B,D,HB,NXT,ROWS) order

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, DP, 1, ROWS, XT),
                             lambda b, d, h, x, *_: (b, d, h * NXT + x, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, DP, 1, ROWS, XT),
                             lambda b, d, h, x, *_: (b, d, h * NXT + x, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ROWS, C, XT),
                             lambda b, d, h, x, *_: (b, h, 0, x),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, DP, ROWS, G, XT),
                                   lambda b, d, h, x, *_: (b, d, h, 0, x),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, DP, K, C, WSRC), src_fea.dtype),
                pltpu.SemaphoreType.DMA((2, DP)),
            ],
        ),
        # bf16 output (ModelConfig.corr_bf16): the correlation accumulates in
        # f32 in-kernel and rounds once at the store; downstream the cost-reg
        # U-Net consumes the volume in bf16 anyway, and halving the largest
        # eval buffers' HBM traffic is the point.
        out_shape=jax.ShapeDtypeStruct((B, D, Hp, G, Wp), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*_barrier_small(y_start.reshape(-1), x_start.reshape(-1), y_off_flat),
      *_barrier(px5, py5, ref_hcw, src_hcw))

    out = jnp.transpose(out[:, :, :H, :, :W], (0, 1, 2, 4, 3))
    return out, invalid


# ---------------------------------------------------------------------------
# v4: v3 windows + IN-KERNEL coordinates and invalid mask.
#
# v3 streams two full pre-computed coordinate volumes (px5/py5, f32 D*H*W
# each per view) into the kernel and leaves the frustum/window invalid mask
# to the caller (one more full-volume bool materialization plus a
# corr*(1-invalid) read-modify-write of the biggest tensor in the model).
# v4 computes px/py/z in-register from the 12 scalars of the relative
# projection rows (ref pixel coords are known from the grid ids; the only
# streamed operand is the depth-hypothesis tile, which for the refined
# stages is an input the model already materialized and for stage-1 [B, D]
# hypotheses is a single SMEM row) and applies the combined
# frustum+band-window mask to the correlation before it is stored. Per
# view-stage this removes: the px/py volume writes, their transposed-copy
# relayouts into kernel operand order, the invalid volume, and the
# corr-sized masking pass. The band/window scalar-prefetch starts are still
# the EXACT v3 per-block/per-row minima — they are reductions over the same
# coordinate field, which XLA now fuses into the depth read because the
# coordinates are no longer a kernel operand that must be materialized.
# Spec: same contract as plane_sweep_group_corr_v3 with want_invalid=False
# semantics folded in (window-clipped and frustum-OOB pixels come back
# zeroed); callers that need the mask itself (epipoleV2 downweighting) keep
# using v3.
#
# Grid order is (B, HB, D//DP, NXT) — row-blocks OUTERMOST — so that the
# optional streaming depth-entropy (want_entropy, for the cnn visibility
# path) can accumulate an online softmax-entropy over the full depth sweep
# of a row block in a [3, ROWS, Wp] VMEM scratch and emit the finished
# entropy map on the last depth step. That removes the caller's
# entropy_over_depth chain: a full re-read of the correlation volume plus
# the sim/softmax/entropy HBM passes, per view. Band DMA volume is
# unchanged by the reorder (one K-row band per (row-block, depth) pair,
# reused across x-tiles, exactly as before — only the sweep order differs).
# ---------------------------------------------------------------------------


def _kernel_v4(
    y_start_ref,  # scalar-prefetch [B*D*HB] i32 (band starts)
    x_start_ref,  # scalar-prefetch [B*D*HB*NXT] i32
    y_off_ref,  # scalar-prefetch [B*D*HB*NXT*ROWS] i32 (row window - band)
    mat_ref,  # [1, 12] f32 SMEM: rows 0/1/2 of the relative projection
    d_ref,  # pixelwise: [1, DP, ROWS, XT] f32 VMEM | scalar: [1, D] f32 SMEM
    ref_ref,  # [1, ROWS, C, XT] (HCW tile)
    src_ref,  # [1, H+K, C, WSRC] (HBM; manual DMA)
    out_ref,  # [1, DP, ROWS, G, XT]
    *rest,  # [ent_ref [1, ROWS, XT] if want_entropy], band_ref, sem,
    #         [ment_ref [3, ROWS, Wp] scratch if want_entropy]
    K: int,
    KR: int,
    JT: int,
    C: int,
    G: int,
    HB: int,
    NXT: int,
    DP: int,
    W: int,
    H: int,
    pixelwise: bool,
    want_entropy: bool,
    KU: int = 0,
):
    # KU > 0: union-band mode. Instead of DP separate K-row bands per
    # (row-block, depth-group) step, ONE KU-row band covering the union of
    # the group's y-windows is DMA'd (y_start_ref then holds the group
    # minimum, duplicated across the group's dp entries, and the per-row
    # window offsets were computed against that shared start with a
    # [0, KU-KR] clamp). The DMA wall is per-byte (docs/DESIGN.md round-4),
    # so for groups whose per-plane windows overlap — always true for
    # refined-stage hypotheses — this cuts kernel HBM bytes by up to
    # DP*K/KU.
    if want_entropy:
        ent_ref, band_ref, sem, ment_ref = rest
    else:
        band_ref, sem = rest
        ent_ref = ment_ref = None

    b = pl.program_id(0)
    hb = pl.program_id(1)
    dblk = pl.program_id(2)
    xt = pl.program_id(3)
    NDBLK = pl.num_programs(2)
    D = NDBLK * DP

    n_step = hb * NDBLK + dblk
    slot = jax.lax.rem(n_step, 2)

    def dma(step_idx, slot_idx, dp):
        hh = step_idx // NDBLK
        dd = jax.lax.rem(step_idx, NDBLK)
        flat_row = (b * D + dd * DP + dp) * HB + hh
        y0 = y_start_ref[flat_row]
        if KU:
            return pltpu.make_async_copy(
                src_ref.at[b, pl.ds(y0, KU)], band_ref.at[slot_idx],
                sem.at[slot_idx, 0])
        return pltpu.make_async_copy(
            src_ref.at[b, pl.ds(y0, K)], band_ref.at[slot_idx, dp],
            sem.at[slot_idx, dp])

    NDMA = 1 if KU else DP

    @pl.when(xt == 0)
    def _():
        @pl.when(n_step == 0)
        def _():
            for dp in range(NDMA):
                dma(n_step, slot, dp).start()
        for dp in range(NDMA):
            dma(n_step, slot, dp).wait()

        @pl.when(n_step + 1 < NDBLK * HB)
        def _():
            for dp in range(NDMA):
                dma(n_step + 1, 1 - slot, dp).start()

    cg = C // G
    gi = jax.lax.broadcasted_iota(jnp.int32, (G, C), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
    gmat_t = ((ci // cg) == gi).astype(jnp.float32) / float(cg)  # [G, C]

    # Relative-projection rows (ref pixel [x, y, 1] -> src homogeneous).
    # mat_ref is the WHOLE [B(,V flattened),12] array in SMEM (a blocked
    # (1,12) spec fails Mosaic's block-shape check once dim0 > 1).
    m = [mat_ref[b, k] for k in range(12)]
    # Reference x coordinates of this output tile (lane axis).
    x_g = (xt * XT).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (1, XT), 1).astype(jnp.float32)

    for dp in range(DP):
        flat_row = (b * D + dblk * DP + dp) * HB + hb
        y0 = y_start_ref[flat_row]
        x0 = pl.multiple_of(x_start_ref[flat_row * NXT + xt], 128)
        x0f = x0.astype(jnp.float32)

        j_abs = x0f + jax.lax.broadcasted_iota(
            jnp.int32, (JT, 1), 0).astype(jnp.float32)
        kr_iota = jax.lax.broadcasted_iota(jnp.int32, (KR, 1), 0).astype(
            jnp.float32)

        if not pixelwise:
            d_s = d_ref[0, dblk * DP + dp]  # SMEM scalar

        for r in range(ROWS):
            off = y_off_ref[(flat_row * NXT + xt) * ROWS + r]
            if KU:
                band_r = band_ref[slot, pl.ds(off, KR), :,
                                  pl.ds(x0, JT)].reshape(KR * C, JT)
            else:
                band_r = band_ref[slot, dp, pl.ds(off, KR), :,
                                  pl.ds(x0, JT)].reshape(KR * C, JT)
            # --- in-register plane-sweep coordinates for this row ---
            y_g = (hb * ROWS + r).astype(jnp.float32)
            d_row = d_ref[0, dp, r].reshape(1, XT) if pixelwise else d_s
            zn = (m[8] * x_g + (m[9] * y_g + m[10])) * d_row + m[11]
            zn = zn + 1e-6
            px_r = ((m[0] * x_g + (m[1] * y_g + m[2])) * d_row + m[3]) / zn
            py_r = ((m[4] * x_g + (m[5] * y_g + m[6])) * d_row + m[7]) / zn
            # Combined frustum + band-window validity (the exact predicate
            # v3's caller applies as corr * (1 - invalid)).
            ywin_lo = (y0 + off).astype(jnp.float32)
            ok = ((px_r >= 0.0) & (px_r <= float(W - 1))
                  & (py_r >= 0.0) & (py_r <= float(H - 1))
                  & (zn > 1e-6)
                  & (px_r >= x0f) & (px_r <= x0f + float(JT - 1))
                  & (py_r >= ywin_lo) & (py_r <= ywin_lo + float(KR - 1)))

            wxt = jnp.maximum(1.0 - jnp.abs(j_abs - px_r), 0.0)  # [JT, XT]
            p = jax.lax.dot_general(
                band_r, wxt.astype(band_r.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [KR*C, XT]
            k_abs = (y0 + off).astype(jnp.float32) + kr_iota  # [KR, 1]
            wy = jnp.maximum(1.0 - jnp.abs(k_abs - py_r), 0.0)  # [KR, XT]
            warped = jnp.zeros((C, XT), jnp.float32)
            for k in range(KR):
                warped = warped + wy[k:k + 1] * p[k * C:(k + 1) * C]
            prod = ref_ref[0, r].astype(jnp.float32) * warped  # [C, XT]
            corr = jax.lax.dot_general(
                gmat_t, prod,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, XT]
            corr = corr * ok.astype(jnp.float32)
            out_ref[0, dp, r] = corr.astype(out_ref.dtype)

            if want_entropy:
                # Online softmax-entropy over depth (one slab at a time):
                # running max M, sum-of-exp S and exp-weighted x-sum T of
                # sim = corr.sum(G); ent = M + log S - T/S on the last slab
                # (== -sum_d p_d log p_d, the caller's entropy_over_depth
                # minus its 1e-7 log epsilon, which only perturbs p ~< 1e-7
                # terms).
                sim = jnp.sum(corr, axis=0, keepdims=True)  # [1, XT]
                sl = pl.ds(xt * XT, XT)
                mm = ment_ref[0, r:r + 1, sl]
                ss = ment_ref[1, r:r + 1, sl]
                tt = ment_ref[2, r:r + 1, sl]
                if dp == 0:
                    # First depth slab of this row block: reset accumulators
                    # (scratch persists across grid steps and still holds the
                    # previous row block's state).
                    first = dblk == 0
                    mm = jnp.where(first, jnp.full_like(mm, -3e38), mm)
                    ss = jnp.where(first, jnp.zeros_like(ss), ss)
                    tt = jnp.where(first, jnp.zeros_like(tt), tt)
                m_new = jnp.maximum(mm, sim)
                scale = jnp.exp(mm - m_new)
                e = jnp.exp(sim - m_new)
                ss = ss * scale + e
                tt = tt * scale + e * sim
                ment_ref[0, r:r + 1, sl] = m_new
                ment_ref[1, r:r + 1, sl] = ss
                ment_ref[2, r:r + 1, sl] = tt
                if dp == DP - 1:
                    @pl.when(dblk == NDBLK - 1)
                    def _():
                        ent_ref[0, r:r + 1] = (m_new + jnp.log(ss)) - tt / ss


def v4_window_invalid(px, py, H: int, W: int, band_rows: int = 12,
                      band_cols: int = 256, row_band: int = 4):
    """XLA reproduction of the WINDOW component of v4's in-kernel mask.

    The v4 kernel zeroes pixels whose py falls outside the per-(row, x-tile)
    KR-row window or whose px falls outside the JT-wide x-window (the same
    block minima the wrapper scalar-prefetches). The training backward
    (warp_corr_train variant 4) multiplies the incoming cotangent by
    (1 - invalid) to be the exact adjoint of the masked forward; combined
    with plane_sweep_coords' frustum mask this reproduces the kernel's `ok`
    predicate. px/py: [B, D, H, W] f32 (unpadded); returns bool [B, D, H, W].
    """
    B, D = px.shape[:2]
    K = band_rows + max(0, ROWS - 8)
    JT, KR = band_cols, row_band
    Hp = -(-H // ROWS) * ROWS
    Wp = -(-W // XT) * XT
    HB, NXT = Hp // ROWS, Wp // XT

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

    py_blk = pyp.reshape(B, D, HB, ROWS, Wp)
    y_start = jnp.clip(jnp.floor(py_blk.min(axis=(3, 4))).astype(jnp.int32),
                       0, H)  # [B, D, HB]
    px_blk = pxp.reshape(B, D, HB, ROWS, NXT, XT)
    x_min = jnp.floor(px_blk.min(axis=(3, 5))).astype(jnp.int32)
    x_start = jnp.clip((x_min // 128) * 128, 0, max_x0)  # [B, D, HB, NXT]

    py_rt = pyp.reshape(B, D, HB, ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    y_row_min = jnp.floor(py_rt.min(axis=-1)).astype(jnp.int32)
    y_off = jnp.clip(y_row_min - y_start[:, :, :, None, None], 0, K - KR)
    ywin_lo = (y_start[:, :, :, None, None] + y_off).astype(jnp.float32)
    # [B, D, HB, NXT, ROWS] -> per-pixel [B, D, HB, ROWS, NXT, XT]
    ywin_lo = jnp.broadcast_to(
        ywin_lo.transpose(0, 1, 2, 4, 3)[..., None],
        (B, D, HB, ROWS, NXT, XT))
    x0f = jnp.broadcast_to(
        x_start.astype(jnp.float32)[:, :, :, None, :, None],
        (B, D, HB, ROWS, NXT, XT))
    ok = ((px_blk >= x0f) & (px_blk <= x0f + float(JT - 1))
          & (py_rt.transpose(0, 1, 2, 4, 3, 5) >= ywin_lo)
          & (py_rt.transpose(0, 1, 2, 4, 3, 5) <= ywin_lo + float(KR - 1)))
    ok = ok.reshape(B, D, Hp, Wp)[:, :, :H, :W]
    return ~ok


def _union_plan(D, K, C, WSRC, union_extra, itemsize):
    """(KU, DP) for union-band mode, or (0, 0) when it does not apply.

    DP is the largest power-of-two group (capped at 8) dividing D; KU = K +
    union_extra rows must double-buffer within the VMEM budget. A group's
    single KU-row band replaces DP K-row bands, so bytes shrink by
    DP*K/KU when every plane's window fits the union (the wrapper re-bases
    the per-row offsets with a [0, KU-KR] clamp; planes whose windows
    escape the union get the same zero-extension treatment v4 already
    applies at the [0, K-KR] clamp)."""
    if union_extra is None:
        return 0, 0
    DP = 0
    for cand in (8, 4, 2):
        if D % cand == 0:
            DP = cand
            break
    if not DP:
        return 0, 0
    KU = K + int(union_extra)
    if 2 * KU * C * WSRC * itemsize > 12 * 1024 * 1024:
        return 0, 0
    return KU, DP


def _union_starts(y_start, y_row_min, D, DP, KU, KR):
    """Re-base y-window starts for union-band mode: per-(.., dblk, hb) group
    minimum duplicated across the group's planes; per-row offsets against
    that shared start with the [0, KU-KR] clamp."""
    VB, _, HB = y_start.shape
    y_u = y_start.reshape(VB, D // DP, DP, HB).min(axis=2)
    y_start = jnp.broadcast_to(
        y_u[:, :, None, :], (VB, D // DP, DP, HB)).reshape(VB, D, HB)
    y_off = jnp.clip(y_row_min - y_start[:, :, :, None, None], 0, KU - KR)
    return y_start, y_off


@functools.partial(jax.jit, static_argnames=("groups", "band_rows", "band_cols",
                                             "row_band", "want_invalid",
                                             "bf16_band", "out_dtype",
                                             "want_entropy", "union_extra"))
def plane_sweep_group_corr_v4(
    ref_fea,  # [B, H, W, C]
    src_fea,  # [B, H, W, C]
    src_proj,  # [B, 4, 4] composed
    ref_proj,  # [B, 4, 4] composed
    depth_values,  # [B, D, H, W] or [B, D]
    groups: int = 8,
    band_rows: int = 12,
    band_cols: int = 256,
    row_band: int = 4,
    want_invalid: bool = False,
    bf16_band: bool = False,
    out_dtype=jnp.float32,
    want_entropy: bool = False,
    union_extra: int | None = None,
):
    """v3 contract with in-kernel coordinates + invalid masking.

    Returns (corr, None) — or (corr, entropy [B, H, W] f32, None) with
    want_entropy: window-clipped and frustum-OOB pixels are already zeroed
    in `corr` (want_invalid is accepted for signature compatibility but the
    mask itself is never materialized — callers that consume the mask, e.g.
    epipoleV2 downweighting, must use v3). The entropy output is the cnn
    visibility path's entropy_over_depth computed in-kernel while the
    correlation volume is still in registers."""
    assert not want_invalid, "v4 folds the mask in-kernel; use v3 for the mask"
    from mvsformer_tpu.ops.geometry import plane_sweep_coords

    B, H, W, C = ref_fea.shape
    D = depth_values.shape[1]
    K, JT, KR = band_rows + max(0, ROWS - 8), band_cols, row_band
    assert KR <= K
    G = groups
    pixelwise = depth_values.ndim == 4

    highest = jax.lax.Precision.HIGHEST
    proj = jnp.matmul(src_proj.astype(jnp.float32),
                      jnp.linalg.inv(ref_proj.astype(jnp.float32)),
                      precision=highest)
    mat = jnp.concatenate(
        [proj[:, 0, :4], proj[:, 1, :4], proj[:, 2, :4]], axis=1)  # [B, 12]
    mat = jax.lax.stop_gradient(mat)

    # Band/window starts: the same EXACT per-block / per-(row, x-tile) minima
    # v3 uses. px/py here feed ONLY these reductions (they are not kernel
    # operands), so XLA fuses the coordinate math into the reduces instead of
    # materializing and relayouting two coordinate volumes.
    px, py, _ = plane_sweep_coords(
        src_proj.astype(jnp.float32), ref_proj.astype(jnp.float32),
        depth_values.astype(jnp.float32), H, W)
    px = jax.lax.stop_gradient(px).reshape(B, D, H, W)
    py = jax.lax.stop_gradient(py).reshape(B, D, H, W)

    Hp = -(-H // ROWS) * ROWS
    Wp = -(-W // XT) * XT
    HB = Hp // ROWS
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

    if bf16_band:
        src_fea = src_fea.astype(jnp.bfloat16)
        ref_fea = ref_fea.astype(jnp.bfloat16)
    max_x0 = (W // 128) * 128
    WSRC = max_x0 + JT
    KU, DPU = _union_plan(D, K, C, WSRC, union_extra, 2 if bf16_band else 4)
    src_hcw = jnp.transpose(src_fea, (0, 1, 3, 2))  # [B, H, C, W]
    src_hcw = _pad_to(_pad_to(src_hcw, H + (KU or K), 1), WSRC, 3)
    ref_hcw = jnp.transpose(ref_fea, (0, 1, 3, 2))
    ref_hcw = _pad_to(_pad_to(ref_hcw, Hp, 1), Wp, 3)

    py_blk = pyp.reshape(B, D, HB, ROWS, Wp)
    y_min = jnp.floor(py_blk.min(axis=(3, 4))).astype(jnp.int32)
    y_start = jnp.clip(y_min, 0, H)
    px_blk = pxp.reshape(B, D, HB, ROWS, NXT, XT)
    x_min = jnp.floor(px_blk.min(axis=(3, 5))).astype(jnp.int32)
    x_start = jnp.clip((x_min // 128) * 128, 0, max_x0)

    # Per-(row, x-tile) y windows inside the band: [B, D, HB, NXT, ROWS].
    py_rt = pyp.reshape(B, D, HB, ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    y_row_min = jnp.floor(py_rt.min(axis=-1)).astype(jnp.int32)
    if KU:
        DP = DPU
        y_start, y_off = _union_starts(y_start, y_row_min, D, DP, KU, KR)
    else:
        y_off = jnp.clip(y_row_min - y_start[:, :, :, None, None], 0, K - KR)
        band_bytes = K * C * WSRC * (2 if bf16_band else 4)
        DP = 1
        for cand in (4, 2):
            if D % cand == 0 and 2 * cand * band_bytes <= 12 * 1024 * 1024:
                DP = cand
                break
    y_off_flat = y_off.reshape(-1)

    grid = (B, HB, D // DP, NXT)  # row-blocks outer: see the v4 banner
    kernel = functools.partial(_kernel_v4, K=K, KR=KR, JT=JT, C=C, G=G, HB=HB,
                               NXT=NXT, DP=DP, W=W, H=H, pixelwise=pixelwise,
                               want_entropy=want_entropy, KU=KU)

    if pixelwise:
        dvp = edge_pad(edge_pad(
            depth_values.astype(jnp.float32), Hp, 2), Wp, 3)
        d_spec = pl.BlockSpec((1, DP, ROWS, XT),
                              lambda b, h, d, x, *_: (b, d, h, x),
                              memory_space=pltpu.VMEM)
    else:
        dvp = depth_values.astype(jnp.float32)  # [B, D]
        d_spec = pl.BlockSpec((1, D), lambda b, h, d, x, *_: (b, 0),
                              memory_space=pltpu.SMEM)
    dvp = jax.lax.stop_gradient(dvp)

    out_shapes = [jax.ShapeDtypeStruct((B, D, Hp, G, Wp), out_dtype)]
    out_specs = [pl.BlockSpec((1, DP, ROWS, G, XT),
                              lambda b, h, d, x, *_: (b, d, h, 0, x),
                              memory_space=pltpu.VMEM)]
    scratch = [
        pltpu.VMEM((2, KU, C, WSRC) if KU else (2, DP, K, C, WSRC),
                   src_fea.dtype),
        pltpu.SemaphoreType.DMA((2, 1) if KU else (2, DP)),
    ]
    if want_entropy:
        out_shapes.append(jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, ROWS, XT),
                                      lambda b, h, d, x, *_: (b, h, x),
                                      memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((3, ROWS, Wp), jnp.float32))

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                d_spec,
                pl.BlockSpec((1, ROWS, C, XT),
                             lambda b, h, d, x, *_: (b, h, 0, x),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*_barrier_small(y_start.reshape(-1), x_start.reshape(-1), y_off_flat),
      mat, dvp, ref_hcw, src_hcw)

    out = jnp.transpose(res[0][:, :, :H, :, :W], (0, 1, 2, 4, 3))
    if want_entropy:
        return out, res[1][:, :H, :W], None
    return out, None


@functools.partial(jax.jit, static_argnames=("groups", "band_rows", "band_cols",
                                             "row_band", "bf16_band",
                                             "out_dtype", "want_entropy",
                                             "union_extra"))
def plane_sweep_group_corr_v4_mv(
    ref_fea,  # [B, H, W, C]
    src_feas,  # [B, V, H, W, C] — ALL source views
    src_projs,  # [B, V, 4, 4] composed
    ref_proj,  # [B, 4, 4] composed
    depth_values,  # [B, D, H, W] or [B, D]
    groups: int = 8,
    band_rows: int = 12,
    band_cols: int = 256,
    row_band: int = 4,
    bf16_band: bool = False,
    out_dtype=jnp.float32,
    want_entropy: bool = False,
    union_extra: int | None = None,
):
    """v4 for ALL source views in ONE pallas_call.

    Motivation: in-model Pallas calls pay a large fixed per-call cost on this
    runtime (the round-3 "DMA wall": ~2 ms/call regardless of size — stage-1
    calls with ~7 MB of real traffic run 2.3 ms). The eval frame makes 16
    warp calls (4 stages x 4 views); folding the view loop into the kernel's
    batch grid dimension pays the wall once per stage instead of once per
    view. The kernel body is UNCHANGED: views ride dim 0 of the grid
    (vb = b*V + v), per-view quantities (projection rows, band starts, source
    bands) are indexed by vb, and view-invariant operands (ref tile, depth
    hypotheses) map through index_map arithmetic (vb // V) with no tiling.

    Returns corr [B, V, D, H, W, G] (+ entropy [B, V, H, W] f32 with
    want_entropy). Numerics are identical to per-view v4 calls.
    """
    B, V, H, W, C = src_feas.shape
    D = depth_values.shape[1]
    VB = B * V
    K, JT, KR = band_rows + max(0, ROWS - 8), band_cols, row_band
    assert KR <= K
    G = groups
    pixelwise = depth_values.ndim == 4

    highest = jax.lax.Precision.HIGHEST
    src_flat = src_feas.reshape(VB, H, W, C)
    proj = jnp.matmul(
        src_projs.reshape(VB, 4, 4).astype(jnp.float32),
        jnp.linalg.inv(ref_proj.astype(jnp.float32))[:, None]
        .repeat(V, 1).reshape(VB, 4, 4),
        precision=highest)
    mat = jnp.concatenate(
        [proj[:, 0, :4], proj[:, 1, :4], proj[:, 2, :4]], axis=1)  # [VB, 12]
    mat = jax.lax.stop_gradient(mat)

    from mvsformer_tpu.ops.geometry import plane_sweep_coords

    ref_rep = jnp.broadcast_to(
        ref_proj.astype(jnp.float32)[:, None], (B, V, 4, 4)).reshape(VB, 4, 4)
    dv_rep = jnp.broadcast_to(
        depth_values.astype(jnp.float32)[:, None],
        (B, V) + depth_values.shape[1:]).reshape((VB,) + depth_values.shape[1:])
    px, py, _ = plane_sweep_coords(
        src_projs.reshape(VB, 4, 4).astype(jnp.float32), ref_rep, dv_rep, H, W)
    px = jax.lax.stop_gradient(px).reshape(VB, D, H, W)
    py = jax.lax.stop_gradient(py).reshape(VB, D, H, W)

    Hp = -(-H // ROWS) * ROWS
    Wp = -(-W // XT) * XT
    HB = Hp // ROWS
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

    ref_band = ref_fea
    if bf16_band:
        src_flat = src_flat.astype(jnp.bfloat16)
        ref_band = ref_band.astype(jnp.bfloat16)
    max_x0 = (W // 128) * 128
    WSRC = max_x0 + JT
    KU, DPU = _union_plan(D, K, C, WSRC, union_extra, 2 if bf16_band else 4)
    src_hcw = jnp.transpose(src_flat, (0, 1, 3, 2))  # [VB, H, C, W]
    src_hcw = _pad_to(_pad_to(src_hcw, H + (KU or K), 1), WSRC, 3)
    ref_hcw = jnp.transpose(ref_band, (0, 1, 3, 2))  # [B, H, C, W]
    ref_hcw = _pad_to(_pad_to(ref_hcw, Hp, 1), Wp, 3)

    py_blk = pyp.reshape(VB, D, HB, ROWS, Wp)
    y_min = jnp.floor(py_blk.min(axis=(3, 4))).astype(jnp.int32)
    y_start = jnp.clip(y_min, 0, H)
    px_blk = pxp.reshape(VB, D, HB, ROWS, NXT, XT)
    x_min = jnp.floor(px_blk.min(axis=(3, 5))).astype(jnp.int32)
    x_start = jnp.clip((x_min // 128) * 128, 0, max_x0)

    py_rt = pyp.reshape(VB, D, HB, ROWS, NXT, XT).transpose(0, 1, 2, 4, 3, 5)
    y_row_min = jnp.floor(py_rt.min(axis=-1)).astype(jnp.int32)
    if KU:
        DP = DPU
        y_start, y_off = _union_starts(y_start, y_row_min, D, DP, KU, KR)
    else:
        y_off = jnp.clip(y_row_min - y_start[:, :, :, None, None], 0, K - KR)
        band_bytes = K * C * WSRC * (2 if bf16_band else 4)
        DP = 1
        for cand in (4, 2):
            if D % cand == 0 and 2 * cand * band_bytes <= 12 * 1024 * 1024:
                DP = cand
                break
    y_off_flat = y_off.reshape(-1)

    grid = (VB, HB, D // DP, NXT)
    kernel = functools.partial(_kernel_v4, K=K, KR=KR, JT=JT, C=C, G=G, HB=HB,
                               NXT=NXT, DP=DP, W=W, H=H, pixelwise=pixelwise,
                               want_entropy=want_entropy, KU=KU)

    if pixelwise:
        dvp = edge_pad(edge_pad(
            depth_values.astype(jnp.float32), Hp, 2), Wp, 3)
        d_spec = pl.BlockSpec((1, DP, ROWS, XT),
                              lambda b, h, d, x, *_: (b // V, d, h, x),
                              memory_space=pltpu.VMEM)
    else:
        dvp = depth_values.astype(jnp.float32)  # [B, D]
        d_spec = pl.BlockSpec((1, D), lambda b, h, d, x, *_: (b // V, 0),
                              memory_space=pltpu.SMEM)
    dvp = jax.lax.stop_gradient(dvp)

    out_shapes = [jax.ShapeDtypeStruct((VB, D, Hp, G, Wp), out_dtype)]
    out_specs = [pl.BlockSpec((1, DP, ROWS, G, XT),
                              lambda b, h, d, x, *_: (b, d, h, 0, x),
                              memory_space=pltpu.VMEM)]
    scratch = [
        pltpu.VMEM((2, KU, C, WSRC) if KU else (2, DP, K, C, WSRC),
                   src_flat.dtype),
        pltpu.SemaphoreType.DMA((2, 1) if KU else (2, DP)),
    ]
    if want_entropy:
        out_shapes.append(jax.ShapeDtypeStruct((VB, Hp, Wp), jnp.float32))
        out_specs.append(pl.BlockSpec((1, ROWS, XT),
                                      lambda b, h, d, x, *_: (b, h, x),
                                      memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((3, ROWS, Wp), jnp.float32))

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                d_spec,
                pl.BlockSpec((1, ROWS, C, XT),
                             lambda b, h, d, x, *_: (b // V, h, 0, x),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*_barrier_small(y_start.reshape(-1), x_start.reshape(-1), y_off_flat),
      mat, dvp, ref_hcw, src_hcw)

    out = jnp.transpose(res[0][:, :, :H, :, :W], (0, 1, 2, 4, 3))
    out = out.reshape(B, V, D, H, W, G)
    if want_entropy:
        return out, res[1][:, :H, :W].reshape(B, V, H, W)
    return out
