"""Training-path fused warp+correlation: Pallas forward, XLA-recompute VJP.

The fused kernel (warp_corr.py) is forward-only. For training we wrap it in a
custom_vjp whose backward re-derives gradients through the XLA gather
formulation (recompute — nothing from the kernel is differentiated):

- forward: the banded-matmul kernel; the warped volume never reaches HBM, so
  the [B, D, H, W, C] residual the autodiff path would have stored simply
  does not exist (large activation-memory saving at train time);
- backward: jax.vjp of homo_warp+groupwise_correlation, recomputed from the
  saved inputs. The cotangent math is exact; forward values differ from the
  XLA path only at band-clipped out-of-frustum pixels.

Gated behind ModelConfig.fused_train_warp (off by default until validated on
real DTU training); depth-value cotangents are zero by construction, matching
the reference's no_grad coordinate computation (warping.py:79).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mvsformer_tpu.ops import correlation as corr_ops
from mvsformer_tpu.ops import geometry
from mvsformer_tpu.ops.pallas import warp_corr


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_warp_corr_train(ref_fea, src_fea, src_proj, ref_proj, depth_values,
                          groups: int = 8, band_rows: int = 12,
                          variant: int = 1):
    # Variant 3's narrow per-row y-window clips more pixels than the block
    # band, and with want_invalid=False those clips are silent while the
    # recompute-backward uses unclipped XLA values — keep training on the
    # wide-band variants (v3 -> v2) so forward/backward stay consistent for
    # all but the rare K-band clips.
    kernel = {
        2: warp_corr.plane_sweep_group_corr_v2,
        3: warp_corr.plane_sweep_group_corr_v2,
    }.get(variant, warp_corr.plane_sweep_group_corr)
    corr, _ = kernel(ref_fea, src_fea, src_proj, ref_proj, depth_values,
                     groups=groups, band_rows=band_rows, want_invalid=False)
    return corr


def _fwd(ref_fea, src_fea, src_proj, ref_proj, depth_values, groups,
         band_rows, variant):
    corr = fused_warp_corr_train(ref_fea, src_fea, src_proj, ref_proj,
                                 depth_values, groups, band_rows, variant)
    return corr, (ref_fea, src_fea, src_proj, ref_proj, depth_values)


def _bwd(groups, band_rows, variant, residuals, dcorr):
    ref_fea, src_fea, src_proj, ref_proj, depth_values = residuals

    def xla_path(ref, src):
        warped, _ = geometry.homo_warp(
            src.astype(jnp.float32), src_proj.astype(jnp.float32),
            ref_proj.astype(jnp.float32), depth_values.astype(jnp.float32))
        return corr_ops.groupwise_correlation(ref.astype(jnp.float32), warped,
                                              groups)

    _, vjp = jax.vjp(xla_path, ref_fea, src_fea)
    dref, dsrc = vjp(dcorr)
    return (dref.astype(ref_fea.dtype), dsrc.astype(src_fea.dtype),
            jnp.zeros_like(src_proj), jnp.zeros_like(ref_proj),
            jnp.zeros_like(depth_values))


fused_warp_corr_train.defvjp(_fwd, _bwd)
