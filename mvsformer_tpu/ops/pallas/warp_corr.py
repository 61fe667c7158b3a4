"""Fused plane-sweep warp + group-wise correlation as a Pallas TPU kernel.

Why: the XLA path (mvsformer_tpu/ops/geometry.homo_warp +
correlation.groupwise_correlation) is 4 per-pixel gathers — TPU gathers are
element-rate-bound (~160M taps/s measured on v5e), making the warp ~80-90% of
eval frame time. This kernel eliminates gathers entirely:

  out[x, c]  = sum_j  relu(1 - |px(x) - j|) * ( sum_k relu(1 - |py(x) - k|) * src[k, j, c] )

i.e. bilinear sampling == multiplying by two tent-kernel interpolation
matrices. The x-pass runs on the MXU as a banded matmul (for a 128-wide
output tile, px spans a ~JT-wide source window, so only one [128, JT] weight
tile is needed); the y-pass is a K-row weighted combine on the VPU. The
warped feature row never exists in HBM — it is correlated with the reference
row in-register and only the [.., G]-group correlation leaves the kernel.

Band semantics: each (depth, row-block, x-tile) step samples a source window
of K rows x JT columns whose origin is precomputed in XLA (stop-gradient
coordinate pass). Taps falling outside the window get zero weight — the same
zero-padding the reference's grid_sample uses for out-of-image taps
(warping.py:105-106) — and pixels whose bilinear support is not fully inside
the window are reported in the `oob` mask (they are exactly the pixels an
out-of-frustum mask would kill for standard MVS camera geometry; the caller
ORs `oob` into the frustum mask).

Forward-only: training keeps the XLA path (exact VJP); inference calls this
kernel via ops/correlation_fast.plane_sweep_group_corr.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # output rows per grid step (sublane tile)
XT = 128  # output columns per grid step (lane tile)


def _kernel(
    y_start_ref,  # scalar-prefetch [B*D*HB] i32
    x_start_ref,  # scalar-prefetch [B*D*HB*NXT] i32
    px_ref,  # [1, 1, ROWS, XT] f32
    py_ref,  # [1, 1, ROWS, XT] f32
    ref_ref,  # [1, ROWS, XT, C]
    src_ref,  # [1, H, C, W] (HBM; manual DMA)
    out_ref,  # [1, 1, ROWS, XT, G] f32
    band_ref,  # scratch [K, C, JT]
    sem,  # DMA semaphore
    *,
    K: int,
    JT: int,
    C: int,
    G: int,
    HB: int,
    NXT: int,
):
    b = pl.program_id(0)
    d = pl.program_id(1)
    hb = pl.program_id(2)
    xt = pl.program_id(3)

    flat_row = (b * pl.num_programs(1) + d) * HB + hb
    y0 = y_start_ref[flat_row]
    x0 = x_start_ref[flat_row * NXT + xt]

    dma = pltpu.make_async_copy(
        src_ref.at[0, pl.ds(y0, K), :, pl.ds(x0, JT)],
        band_ref,
        sem,
    )
    dma.start()

    px = px_ref[0, 0]  # [ROWS, XT]
    py = py_ref[0, 0]

    # Tent weights. j iota is the absolute source column of each band column.
    # (Mosaic only supports integer iota — cast after.)
    j_abs = x0.astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (XT, JT), 1).astype(jnp.float32)
    k_abs = y0.astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (XT, K), 1).astype(jnp.float32)

    dma.wait()
    band = band_ref[:].reshape(K * C, JT)  # [K*C, JT]

    cg = C // G
    # Block-diagonal group-averaging matrix [C, G].
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    gmat = ((ci // cg) == gi).astype(jnp.float32) / float(cg)

    for r in range(ROWS):
        wx = jnp.maximum(1.0 - jnp.abs(px[r][:, None] - j_abs), 0.0)  # [XT, JT]
        p = jax.lax.dot_general(
            wx, band,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [XT, K*C]
        wy = jnp.maximum(1.0 - jnp.abs(py[r][:, None] - k_abs), 0.0)  # [XT, K]
        warped = jnp.zeros((XT, C), jnp.float32)
        for k in range(K):
            warped = warped + wy[:, k:k + 1] * p[:, k * C:(k + 1) * C]
        refrow = ref_ref[0, r].astype(jnp.float32)  # [XT, C]
        corr = jnp.dot(refrow * warped, gmat,
                       preferred_element_type=jnp.float32)  # [XT, G]
        out_ref[0, 0, r] = corr


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@functools.partial(jax.jit, static_argnames=("groups", "band_rows", "band_cols"))
def plane_sweep_group_corr(
    ref_fea,  # [B, H, W, C]
    src_fea,  # [B, H, W, C]
    src_proj,  # [B, 4, 4] composed
    ref_proj,  # [B, 4, 4] composed
    depth_values,  # [B, D, H, W] or [B, D]
    groups: int = 8,
    band_rows: int = 16,
    band_cols: int = 256,
):
    """Fused warp + G-group correlation for ONE source view.

    Returns (corr [B, D, H, W, G] f32, invalid [B, D, H, W] bool) matching
    groupwise_correlation(homo_warp(...)) up to the band semantics above.
    """
    from mvsformer_tpu.ops.geometry import plane_sweep_coords

    B, H, W, C = ref_fea.shape
    D = depth_values.shape[1]
    K, JT = band_rows, band_cols
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

    # Source in [B, H, C, W] so a band DMA lands as [K, C, JT] with the
    # contraction axis (w) minor. Pad W by JT so any clamped window fits.
    src_hcw = jnp.transpose(src_fea, (0, 1, 3, 2))  # [B, H, C, W]
    src_hcw = _pad_to(_pad_to(src_hcw, H + K, 1), W + JT, 3)

    # Window origins (XLA precompute): per (b, d, row-block) y band start and
    # per (b, d, row-block, x-tile) column window start.
    py_blk = pyp.reshape(B, D, HB, ROWS, Wp)
    y_min = jnp.floor(py_blk.min(axis=(3, 4))).astype(jnp.int32)
    y_start = jnp.clip(y_min, 0, H)  # padded src has H+K rows
    px_blk = pxp.reshape(B, D, HB, ROWS, NXT, XT)
    x_min = jnp.floor(px_blk.min(axis=(3, 5))).astype(jnp.int32)
    x_start = jnp.clip(x_min, 0, W)  # padded src has W+JT cols

    # Out-of-band support -> invalid (band must cover floor(p)..floor(p)+1).
    y_hi = y_start.astype(jnp.float32)[:, :, :, None, None] + (K - 1)
    y_lo = y_start.astype(jnp.float32)[:, :, :, None, None]
    oob_y = (py_blk < y_lo - 0.0) | (py_blk > y_hi)
    oob_y = oob_y.reshape(B, D, Hp, Wp)[:, :, :H, :W]
    x_hi = x_start.astype(jnp.float32)[:, :, :, None, :, None] + (JT - 1)
    x_lo = x_start.astype(jnp.float32)[:, :, :, None, :, None]
    oob_x = (px_blk < x_lo) | (px_blk > x_hi)
    oob_x = oob_x.reshape(B, D, Hp, Wp)[:, :, :H, :W]
    invalid = invalid | oob_x | oob_y

    grid = (B, D, HB, NXT)
    kernel = functools.partial(_kernel, K=K, JT=JT, C=C, G=G, HB=HB, NXT=NXT)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, ROWS, XT),
                             lambda b, d, h, x, *_: (b, d, h, x),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ROWS, XT),
                             lambda b, d, h, x, *_: (b, d, h, x),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ROWS, XT, C),
                             lambda b, d, h, x, *_: (b, h, x, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 1, ROWS, XT, G),
                                   lambda b, d, h, x, *_: (b, d, h, x, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((K, C, JT), src_fea.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, D, Hp, Wp, G), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
    )(y_start.reshape(-1), x_start.reshape(-1), pxp, pyp,
      refp.astype(src_fea.dtype), src_hcw)

    return out[:, :, :H, :W], invalid
