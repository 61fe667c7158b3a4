"""Fused GSA attention kernel (ops/pallas/gsa_attention.py) vs the XLA path.

The kernel computes the per-head softmax attention of
GlobalSubsampledAttention with fp32 logits (the XLA einsum path rounds the
logit matrix through bf16 before the fp32 softmax), so parity tolerances
absorb one bf16 rounding of O(1)-scale logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mvsformer_tpu.models.twins import GlobalSubsampledAttention
from mvsformer_tpu.ops.pallas.gsa_attention import gsa_attention


def _ref_attention(q, k, v, nh):
    B, N, C = q.shape
    hd = C // nh
    qh = q.reshape(B, N, nh, hd)
    kh = k.reshape(B, -1, nh, hd)
    vh = v.reshape(B, -1, nh, hd)
    attn = jnp.einsum("bqnd,bknd->bnqk", qh, kh).astype(jnp.float32)
    attn = attn * hd ** -0.5
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", attn, vh).reshape(B, N, C)


@pytest.mark.parametrize("N,Nk,C,nh", [
    (300, 24, 64, 2),    # N padded to the 256-row tile, Nk already 8-aligned
    (256, 10, 64, 4),    # Nk padded -> key masking path
    (512, 48, 128, 4),
])
def test_kernel_matches_einsum(N, Nk, C, nh):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, N, C)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, Nk, C)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, Nk, C)), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = gsa_attention(q, k, v, nh)
    want = _ref_attention(q, k, v, nh)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2)


def test_module_fused_matches_unfused():
    """GlobalSubsampledAttention with fused=True must reproduce the einsum
    path through the whole module (sr conv + norm + qkv + proj)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 64)), jnp.bfloat16)
    m_ref = GlobalSubsampledAttention(64, 2, sr_ratio=4, fused=False)
    m_fused = GlobalSubsampledAttention(64, 2, sr_ratio=4, fused=True)
    v = m_ref.init(jax.random.PRNGKey(0), x)
    y_ref = m_ref.apply(v, x)
    with pltpu.force_tpu_interpret_mode():
        y_fused = m_fused.apply(v, x, fused_ok=True)
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_ref, np.float32),
        rtol=3e-2, atol=3e-2)
