"""Parity test: Pallas fused warp+correlation vs the XLA reference path.

Runs in Pallas interpret mode on CPU (the kernel's compiled path is exercised
on real TPU by bench.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mvsformer_tpu.ops import correlation, geometry
from mvsformer_tpu.ops.pallas import warp_corr

from tests.test_warp import random_cameras


@pytest.mark.parametrize("shape", [(48, 128, 4, 8), (40, 192, 6, 16)])
def test_fused_warp_corr_matches_xla(rng, shape):
    H, W, D, C = shape
    B, G = 1, 8
    ref = rng.standard_normal((B, H, W, C), dtype=np.float32)
    src = rng.standard_normal((B, H, W, C), dtype=np.float32)
    src_proj, ref_proj = random_cameras(rng, B)
    # Keep the camera compatible with the band assumptions (small baseline).
    dv = np.broadcast_to(
        np.linspace(400, 900, D, dtype=np.float32)[None, :, None, None],
        (B, D, H, W)).copy()
    dv += rng.uniform(-2, 2, dv.shape).astype(np.float32)

    warped, invalid_xla = geometry.homo_warp(
        jnp.asarray(src), jnp.asarray(src_proj), jnp.asarray(ref_proj),
        jnp.asarray(dv))
    want = np.asarray(correlation.groupwise_correlation(jnp.asarray(ref), warped, G))

    with pltpu.force_tpu_interpret_mode():
        got, invalid = warp_corr.plane_sweep_group_corr(
            jnp.asarray(ref), jnp.asarray(src), jnp.asarray(src_proj),
            jnp.asarray(ref_proj), jnp.asarray(dv), groups=G,
            band_rows=16, band_cols=256)
    got = np.asarray(got)
    invalid = np.asarray(invalid)

    valid = ~invalid
    # At valid pixels the fused kernel must reproduce the XLA correlation.
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)
    # The band-oob mask may only ADD invalids on top of the frustum mask.
    assert (np.asarray(invalid_xla) <= invalid).all()
    # And it should not excessively eat valid pixels for this geometry.
    assert valid.mean() > 0.5


@pytest.mark.parametrize("shape", [(48, 128, 4, 8), (40, 192, 6, 16)])
def test_fused_warp_corr_v2_matches_xla(rng, shape):
    H, W, D, C = shape
    B, G = 1, 8
    ref = rng.standard_normal((B, H, W, C), dtype=np.float32)
    src = rng.standard_normal((B, H, W, C), dtype=np.float32)
    src_proj, ref_proj = random_cameras(rng, B)
    dv = np.broadcast_to(
        np.linspace(400, 900, D, dtype=np.float32)[None, :, None, None],
        (B, D, H, W)).copy()
    dv += rng.uniform(-2, 2, dv.shape).astype(np.float32)

    warped, _ = geometry.homo_warp(
        jnp.asarray(src), jnp.asarray(src_proj), jnp.asarray(ref_proj),
        jnp.asarray(dv))
    want = np.asarray(correlation.groupwise_correlation(jnp.asarray(ref), warped, G))

    with pltpu.force_tpu_interpret_mode():
        got, invalid = warp_corr.plane_sweep_group_corr_v2(
            jnp.asarray(ref), jnp.asarray(src), jnp.asarray(src_proj),
            jnp.asarray(ref_proj), jnp.asarray(dv), groups=G,
            band_rows=16, band_cols=256)
    got = np.asarray(got)
    invalid = np.asarray(invalid)
    valid = ~invalid
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)
    assert valid.mean() > 0.5


def test_fused_train_warp_grads_match_xla(rng):
    """custom_vjp (kernel fwd / XLA-recompute bwd) must produce the exact XLA
    gradients for ref/src features."""
    from mvsformer_tpu.ops.pallas.warp_corr_train import fused_warp_corr_train

    H, W, D, C, G = 24, 128, 3, 8, 8
    B = 1
    ref = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    src = jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
    src_proj, ref_proj = map(jnp.asarray, random_cameras(rng, B))
    dv = jnp.asarray(np.broadcast_to(
        np.linspace(400, 900, D, dtype=np.float32)[None, :, None, None],
        (B, D, H, W)).copy())

    def xla_loss(ref, src):
        warped, _ = geometry.homo_warp(src, src_proj, ref_proj, dv)
        corr = correlation.groupwise_correlation(ref, warped, G)
        return (corr ** 2).sum()

    want = jax.grad(xla_loss, argnums=(0, 1))(ref, src)

    def fused_loss(ref, src):
        corr = fused_warp_corr_train(ref, src, src_proj, ref_proj, dv, G, 16, 1)
        return (corr ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(fused_loss, argnums=(0, 1))(ref, src)

    # The cotangent entering the recompute-bwd differs from the XLA path only
    # at band-clipped pixels; with in-band geometry the grads are equal.
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-3,
                                   atol=1e-3)


@pytest.mark.parametrize("shape", [(48, 128, 4, 8), (40, 192, 6, 16)])
def test_fused_warp_corr_v3_matches_xla(rng, shape):
    """v3 (per-row y-windows): exact at pixels inside the per-row band."""
    H, W, D, C = shape
    B, G = 1, 8
    ref = rng.standard_normal((B, H, W, C), dtype=np.float32)
    src = rng.standard_normal((B, H, W, C), dtype=np.float32)
    src_proj, ref_proj = random_cameras(rng, B)
    dv = np.broadcast_to(
        np.linspace(400, 900, D, dtype=np.float32)[None, :, None, None],
        (B, D, H, W)).copy()
    dv += rng.uniform(-2, 2, dv.shape).astype(np.float32)

    warped, invalid_xla = geometry.homo_warp(
        jnp.asarray(src), jnp.asarray(src_proj), jnp.asarray(ref_proj),
        jnp.asarray(dv))
    want = np.asarray(correlation.groupwise_correlation(jnp.asarray(ref), warped, G))

    with pltpu.force_tpu_interpret_mode():
        got, invalid = warp_corr.plane_sweep_group_corr_v3(
            jnp.asarray(ref), jnp.asarray(src), jnp.asarray(src_proj),
            jnp.asarray(ref_proj), jnp.asarray(dv), groups=G,
            band_rows=16, band_cols=256, row_band=4)
    got = np.asarray(got)
    invalid = np.asarray(invalid)
    valid = ~invalid
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)
    assert (np.asarray(invalid_xla) <= invalid).all()
    assert valid.mean() > 0.5


def test_fused_warp_corr_bf16_band(rng):
    """bf16 band end-to-end: looser tolerance (~2^-8 weight quantization)."""
    H, W, D, C = 48, 128, 4, 8
    B, G = 1, 8
    ref = rng.standard_normal((B, H, W, C), dtype=np.float32)
    src = rng.standard_normal((B, H, W, C), dtype=np.float32)
    src_proj, ref_proj = random_cameras(rng, B)
    dv = np.broadcast_to(
        np.linspace(400, 900, D, dtype=np.float32)[None, :, None, None],
        (B, D, H, W)).copy()

    warped, _ = geometry.homo_warp(
        jnp.asarray(src), jnp.asarray(src_proj), jnp.asarray(ref_proj),
        jnp.asarray(dv))
    want = np.asarray(correlation.groupwise_correlation(jnp.asarray(ref), warped, G))

    with pltpu.force_tpu_interpret_mode():
        got, invalid = warp_corr.plane_sweep_group_corr_v3(
            jnp.asarray(ref), jnp.asarray(src), jnp.asarray(src_proj),
            jnp.asarray(ref_proj), jnp.asarray(dv), groups=G,
            band_rows=16, band_cols=256, bf16_band=True)
    got = np.asarray(got)
    valid = ~np.asarray(invalid)
    np.testing.assert_allclose(got[valid], want[valid], rtol=0.05, atol=0.02)
    assert valid.mean() > 0.5


@pytest.mark.parametrize("variant", [1, 2, 3])
def test_fused_warp_corr_batch2(rng, variant):
    """Regression: the band DMA must read each batch element's own source
    (a batch-0-only indexing bug corrupted every b>0 sample)."""
    H, W, D, C = 48, 128, 4, 8
    B, G = 2, 8
    ref = rng.standard_normal((B, H, W, C), dtype=np.float32)
    src = rng.standard_normal((B, H, W, C), dtype=np.float32)
    sp1, rp1 = random_cameras(rng, 1)
    sp2, rp2 = random_cameras(rng, 1)
    src_proj = np.concatenate([sp1, sp2])
    ref_proj = np.concatenate([rp1, rp2])
    dv = np.broadcast_to(
        np.linspace(400, 900, D, dtype=np.float32)[None, :, None, None],
        (B, D, H, W)).copy()

    warped, _ = geometry.homo_warp(
        jnp.asarray(src), jnp.asarray(src_proj), jnp.asarray(ref_proj),
        jnp.asarray(dv))
    want = np.asarray(correlation.groupwise_correlation(jnp.asarray(ref), warped, G))

    fn = {1: warp_corr.plane_sweep_group_corr,
          2: warp_corr.plane_sweep_group_corr_v2,
          3: warp_corr.plane_sweep_group_corr_v3}[variant]
    with pltpu.force_tpu_interpret_mode():
        got, invalid = fn(
            jnp.asarray(ref), jnp.asarray(src), jnp.asarray(src_proj),
            jnp.asarray(ref_proj), jnp.asarray(dv), groups=G,
            band_rows=16, band_cols=256)
    got = np.asarray(got)
    valid = ~np.asarray(invalid)
    for bi in range(B):
        np.testing.assert_allclose(got[bi][valid[bi]], want[bi][valid[bi]],
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"batch {bi} variant {variant}")
        assert valid[bi].mean() > 0.5
