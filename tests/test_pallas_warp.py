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
