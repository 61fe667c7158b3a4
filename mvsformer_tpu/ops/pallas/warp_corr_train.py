"""Training-path fused warp+correlation: Pallas forward, kernel or XLA VJP.

The fused kernel (warp_corr.py) is forward-only. For training we wrap it in a
custom_vjp with two backward implementations:

- native_bwd=True (default): the Pallas backward kernel
  (warp_corr_bwd.plane_sweep_group_corr_bwd) — the exact adjoint of the
  band-formulated forward, computed as transposed banded matmuls with no
  XLA gather/scatter anywhere in the training warp;
- native_bwd=False: jax.vjp of homo_warp+groupwise_correlation, recomputed
  from the saved inputs (the round-1 fallback; exact for the UNclipped
  gather formulation, so it deviates from the kernel forward at
  band-clipped pixels).

Either way the [B, D, H, W, C] warped-volume residual the autodiff path
would have stored never exists (large activation-memory saving at train
time). Gated behind ModelConfig.fused_train_warp; depth-value cotangents are
zero by construction, matching the reference's no_grad coordinate
computation (warping.py:79).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mvsformer_tpu.ops import correlation as corr_ops
from mvsformer_tpu.ops import geometry
from mvsformer_tpu.ops.pallas import warp_corr


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_warp_corr_train(ref_fea, src_fea, src_proj, ref_proj, depth_values,
                          groups: int = 8, band_rows: int = 12,
                          variant: int = 1, native_bwd: bool = True):
    # Variant 3 (narrow per-row y-windows) is only used when the NATIVE
    # backward is on: the Pallas bwd kernel with the same row_band is the
    # exact adjoint of the clipped forward, so fwd/bwd stay self-consistent.
    # With the XLA-recompute fallback the backward differentiates the
    # UNclipped gather formulation, so v3's extra clips would make fwd/bwd
    # disagree — fall back to the wide-band v2 forward there.
    # Variant 4 (in-kernel coordinates + combined frustum/window mask): the
    # training forward runs the v4 kernel — no px/py coordinate VOLUMES are
    # materialized in the train graph, only the block-minima index arrays —
    # and the backward is the v3 band adjoint applied to the mask-gated
    # cotangent: v4(x) == v3(x) * ok, so vjp(g) == v3_adjoint(ok * g) with
    # `ok` reproduced in XLA (plane_sweep_coords frustum mask +
    # warp_corr.v4_window_invalid). Needs the native backward; with the
    # XLA-recompute fallback fall back to v2 exactly as v3 does.
    if variant == 4 and not native_bwd:
        variant = 2
    if variant == 3 and not native_bwd:
        variant = 2
    kernel = {
        2: warp_corr.plane_sweep_group_corr_v2,
        3: warp_corr.plane_sweep_group_corr_v3,
        4: warp_corr.plane_sweep_group_corr_v4,
    }.get(variant, warp_corr.plane_sweep_group_corr)
    corr, _ = kernel(ref_fea, src_fea, src_proj, ref_proj, depth_values,
                     groups=groups, band_rows=band_rows, want_invalid=False)
    return corr


def _fwd(ref_fea, src_fea, src_proj, ref_proj, depth_values, groups,
         band_rows, variant, native_bwd):
    corr = fused_warp_corr_train(ref_fea, src_fea, src_proj, ref_proj,
                                 depth_values, groups, band_rows, variant,
                                 native_bwd)
    return corr, (ref_fea, src_fea, src_proj, ref_proj, depth_values)


def _bwd(groups, band_rows, variant, native_bwd, residuals, dcorr):
    ref_fea, src_fea, src_proj, ref_proj, depth_values = residuals

    if native_bwd:
        from mvsformer_tpu.ops.pallas.warp_corr_bwd import (
            plane_sweep_group_corr_bwd,
        )

        if variant == 4:
            # v4 fwd == v3 fwd * ok; adjoint = v3 adjoint of the gated
            # cotangent. Reproduce the kernel's `ok` in XLA (stop-gradient
            # coordinate math, same as the wrapper's scalar prefetch).
            B = ref_fea.shape[0]
            H, W = ref_fea.shape[1], ref_fea.shape[2]
            dv32 = jax.lax.stop_gradient(depth_values.astype(jnp.float32))
            px, py, frustum = geometry.plane_sweep_coords(
                src_proj.astype(jnp.float32), ref_proj.astype(jnp.float32),
                dv32, H, W)
            px = jax.lax.stop_gradient(px).reshape(B, -1, H, W)
            py = jax.lax.stop_gradient(py).reshape(B, -1, H, W)
            win = warp_corr.v4_window_invalid(
                px, py, H, W, band_rows=band_rows)
            ok = jnp.logical_not(
                frustum.reshape(B, -1, H, W) | win).astype(dcorr.dtype)
            dcorr = dcorr * ok[..., None]

        # variant 3/4 forwards ran per-row KR=4 windows — the backward must
        # use the same windows to be their exact adjoint.
        dref, dsrc = plane_sweep_group_corr_bwd(
            ref_fea, src_fea, src_proj.astype(jnp.float32),
            ref_proj.astype(jnp.float32), depth_values, dcorr,
            groups=groups, band_rows=band_rows,
            row_band=4 if variant in (3, 4) else None)
    else:
        def xla_path(ref, src):
            warped, _ = geometry.homo_warp(
                src.astype(jnp.float32), src_proj.astype(jnp.float32),
                ref_proj.astype(jnp.float32),
                depth_values.astype(jnp.float32))
            return corr_ops.groupwise_correlation(
                ref.astype(jnp.float32), warped, groups)

        _, vjp = jax.vjp(xla_path, ref_fea, src_fea)
        dref, dsrc = vjp(dcorr)
    return (dref.astype(ref_fea.dtype), dsrc.astype(src_fea.dtype),
            jnp.zeros_like(src_proj), jnp.zeros_like(ref_proj),
            jnp.zeros_like(depth_values))


fused_warp_corr_train.defvjp(_fwd, _bwd)
