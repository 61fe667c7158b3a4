"""Cross-view linear attention (kernelized, O(V*H*W)) with epipolar
positional encodings.

Functional spec: /root/reference/models/vision_transformer.py:156-321 —
`CrossAttention` (ELU+1 feature-map linear attention over ALL views' tokens
jointly) and `CrossBlock` (zero-init gated residuals alpha1/alpha2, ref/src
token-type embeddings, and the "scheme 3" epipolar encodings: relative
direction to the epipole (sine, C/2), absolute epipole direction (sine, C/4)
and clamped epipole distance (sine, C/4)). Present-but-disabled in the
reference's shipped configs (`cross_att` default False, :352); provided here
for capability parity and enabled via ViTConfig.cross_att.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def sine_position_embedding(u, v, num_feats: int, scale: float):
    """2D sine embedding of (u, v) -> [..., 2*num_feats]
    (PositionEmbeddingSine semantics: interleaved sin/cos per dim)."""
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    pu = (u * scale)[..., None] / dim_t
    pv = (v * scale)[..., None] / dim_t
    pu = jnp.stack([jnp.sin(pu[..., 0::2]), jnp.cos(pu[..., 1::2])], axis=-1).reshape(*u.shape, -1)
    pv = jnp.stack([jnp.sin(pv[..., 0::2]), jnp.cos(pv[..., 1::2])], axis=-1).reshape(*v.shape, -1)
    return jnp.concatenate([pv, pu], axis=-1)


def sine_position_embedding_1d(d, num_feats: int, scale: float):
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    pd = (d * scale)[..., None] / dim_t
    return jnp.stack([jnp.sin(pd[..., 0::2]), jnp.cos(pd[..., 1::2])], axis=-1).reshape(*d.shape, -1)


class CrossAttention(nn.Module):
    """ELU+1 kernelized linear attention across all V*HW tokens."""

    dim: int
    num_heads: int
    nview: int = 5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: [B*V, N, C]
        BV, N, C = x.shape
        V = self.nview
        B = BV // V
        nh = self.num_heads
        hd = C // nh

        xc = x.reshape(B, V * N, C)
        qkv = nn.Dense(C * 3, use_bias=False, dtype=self.dtype, name="qkv")(xc)
        qkv = qkv.reshape(B, V * N, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, VN, nh, hd]
        q = (nn.elu(q) + 1.0).astype(jnp.float32)
        k = (nn.elu(k) + 1.0).astype(jnp.float32)
        v = v.astype(jnp.float32)

        kv = jnp.einsum("nlhd,nlhm->nhmd", k, v)  # [B, nh, hd(m), hd(d)]
        z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", q, k.sum(axis=1)) + 1e-6)
        y = jnp.einsum("nlhd,nhmd,nlh->nlhm", q, kv, z)  # [B, VN, nh, hd]
        y = y.reshape(B, V * N, C).reshape(BV, N, C).astype(self.dtype)
        return nn.Dense(C, dtype=self.dtype, name="proj")(y)


class CrossBlock(nn.Module):
    """Gated cross-view block with token-type / epipolar embeddings."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    nview: int = 5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, epipole=None, height: int = 0, width: int = 0):
        # x: [B*V, 1+HW, C]; epipole: [B, V-1, 2] or None
        BV, N, C = x.shape
        V = self.nview
        B = BV // V

        tok_table = nn.Embed(2, C, dtype=self.dtype, name="tok_embeddings")

        if epipole is None:
            ids = jnp.concatenate(
                [jnp.zeros((B, 1, N), jnp.int32), jnp.ones((B, V - 1, N), jnp.int32)],
                axis=1).reshape(BV, N)
            tok_emb = tok_table(ids)
        else:
            HW = N - 1
            y_ = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
            x_ = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
            epi = epipole.reshape(B, V - 1, 2, 1, 1)
            rel_u = x_[None, None] - epi[:, :, 0]
            rel_v = y_[None, None] - epi[:, :, 1]
            norm = jnp.sqrt(rel_u**2 + rel_v**2) + 1e-6
            rel_u, rel_v = rel_u / norm, rel_v / norm
            rel_emb = sine_position_embedding(
                rel_u.reshape(B * (V - 1), HW), rel_v.reshape(B * (V - 1), HW),
                C // 4, scale=32 * math.pi)  # [B(V-1), HW, C/2]

            epin = epipole / (jnp.linalg.norm(epipole, axis=-1, keepdims=True) + 1e-12)
            abs_u = jnp.broadcast_to(epin[..., 0:1, None], (B, V - 1, height, width))
            abs_v = jnp.broadcast_to(epin[..., 1:2, None], (B, V - 1, height, width))
            dir_emb = sine_position_embedding(
                abs_u.reshape(B * (V - 1), HW), abs_v.reshape(B * (V - 1), HW),
                C // 8, scale=2 * math.pi)  # C/4
            dist = jnp.clip(jnp.linalg.norm(epipole, axis=-1) / 512.0, 0.0, 1.0)
            dist = jnp.broadcast_to(dist[..., None, None], (B, V - 1, height, width))
            dis_emb = sine_position_embedding_1d(
                dist.reshape(B * (V - 1), HW), C // 4, scale=2 * math.pi)  # C/4

            epi_emb = jnp.concatenate([dir_emb, dis_emb, rel_emb], axis=-1)
            epi_emb = epi_emb.reshape(B, V - 1, HW, C).astype(self.dtype)

            ref_emb = tok_table(jnp.zeros((B, N), jnp.int32))[:, None]  # [B,1,N,C]
            sep_emb = tok_table(jnp.ones((B, V - 1), jnp.int32))[:, :, None]
            src_emb = jnp.concatenate([sep_emb, epi_emb], axis=2)  # [B,V-1,N,C]
            tok_emb = jnp.concatenate([ref_emb, src_emb], axis=1).reshape(BV, N, C)

        alpha1 = self.param("alpha1", nn.initializers.zeros, ())
        alpha2 = self.param("alpha2", nn.initializers.zeros, ())

        x1 = x + tok_emb
        attn = CrossAttention(self.dim, self.num_heads, self.nview,
                              dtype=self.dtype, name="attn")(x1)
        x2 = x + alpha1 * attn
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(x2)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x2 + alpha2 * h
