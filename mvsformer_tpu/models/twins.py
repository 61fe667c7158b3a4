"""Twins-SVT (ALTGVT) pyramid vision transformer backbone.

Functional spec: /root/reference/models/gvt.py — a 4-stage pyramid ViT that
alternates windowed local attention (GroupAttention, 7x7 windows with pad
masking, gvt.py:29-121) and globally-subsampled attention (conv-downsampled
KV, gvt.py:124-166), with a conditional positional encoding conv (PosCNN,
gvt.py:360-378) after each stage's first block and a per-stage LayerNorm
(extra_norm). Presets: alt_gvt_small/base/large (gvt.py:550-571).

TPU-first notes: tokens stay in [B, H, W, C] layout between blocks so window
partitioning is pure reshape/transpose (no gathers); attention is einsum ->
MXU; all static shapes per input resolution. Stochastic depth uses a single
bernoulli draw per (sample, block) — same semantics as timm DropPath.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def drop_path(x, rate: float, deterministic: bool, rng):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class GroupAttention(nn.Module):
    """Windowed multi-head self-attention with padding mask (gvt.py:65-96)."""

    dim: int
    num_heads: int
    ws: int = 7
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        B, H, W, C = x.shape
        ws = self.ws
        nh = self.num_heads
        hd = C // nh
        scale = hd ** -0.5

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        nwh, nww = Hp // ws, Wp // ws

        # Padding mask: padded tokens neither attend nor get attended to
        # (matches the reference's forward_mask additive-bias construction).
        is_pad = jnp.zeros((Hp, Wp), jnp.float32)
        if pad_b:
            is_pad = is_pad.at[-pad_b:, :].set(1.0)
        if pad_r:
            is_pad = is_pad.at[:, -pad_r:].set(1.0)
        pm = is_pad.reshape(nwh, ws, nww, ws).transpose(0, 2, 1, 3).reshape(nwh * nww, ws * ws)
        attn_bias = jnp.where((pm[:, None, :] - pm[:, :, None]) != 0.0, -1000.0, 0.0)

        qkv = nn.Dense(C * 3, use_bias=True, dtype=self.dtype, name="qkv")(xp)
        qkv = qkv.reshape(B, nwh, ws, nww, ws, 3, nh, hd)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7).reshape(3, B, nwh * nww, nh, ws * ws, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k).astype(jnp.float32) * scale
        attn = attn + attn_bias[None, :, None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bwhnm,bwhmd->bwhnd", attn, v)

        out = out.reshape(B, nwh, nww, nh, ws, ws, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, Hp, Wp, C)
        out = out[:, :H, :W]
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class GlobalSubsampledAttention(nn.Module):
    """Global attention with spatially-reduced KV (gvt.py:124-166)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    dtype: Dtype = jnp.bfloat16
    fused: bool = False  # ModelConfig.fused_gsa: one-Pallas-pass attention
    # (ops/pallas/gsa_attention.py) — the fp32 [B,nh,N,Nk] logit matrix and
    # the head-split transposes never exist in HBM. Eval path (the caller
    # gates on deterministic).

    @nn.compact
    def __call__(self, x, fused_ok: bool = False):  # x: [B, H, W, C]
        B, H, W, C = x.shape
        nh = self.num_heads
        hd = C // nh
        scale = hd ** -0.5

        q = nn.Dense(C, use_bias=True, dtype=self.dtype, name="q")(x)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                C, (self.sr_ratio, self.sr_ratio), strides=self.sr_ratio,
                padding="VALID", dtype=self.dtype, name="sr",
            )(x)
            kv_in = nn.LayerNorm(dtype=self.dtype, name="norm")(kv_in)
        Nk = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(C * 2, use_bias=True, dtype=self.dtype, name="kv")(kv_in)

        if self.fused and fused_ok:
            from mvsformer_tpu.ops.pallas.gsa_attention import gsa_attention

            kv2 = kv.reshape(B, Nk, 2 * C)
            out = gsa_attention(q.reshape(B, H * W, C),
                                kv2[..., :C], kv2[..., C:], nh)
            out = out.reshape(B, H, W, C)
            return nn.Dense(C, dtype=self.dtype, name="proj")(out)

        q = q.reshape(B, H * W, nh, hd)
        kv = kv.reshape(B, Nk, 2, nh, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", attn, v).reshape(B, H, W, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class PosCNN(nn.Module):
    """Conditional positional encoding: depthwise 3x3 conv + residual
    (gvt.py:360-378, s=1 path)."""

    dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        y = nn.Conv(
            self.dim, (3, 3), padding="SAME", feature_group_count=self.dim,
            use_bias=True, dtype=self.dtype, name="proj",
        )(x)
        return y + x


class TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    ws: int  # 1 => global subsampled attention
    sr_ratio: int
    drop_path_rate: float
    dtype: Dtype = jnp.bfloat16
    fused_attn: bool = False  # route GSA through the Pallas kernel
    # (deterministic passes only — the kernel has no VJP; under cfg.fix the
    # backbone is stop_gradient'ed so frozen-backbone training also routes)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.ws == 1:
            attn = GlobalSubsampledAttention(
                self.dim, self.num_heads, self.sr_ratio, dtype=self.dtype,
                fused=self.fused_attn, name="attn")
            attn = functools.partial(attn, fused_ok=deterministic)
        else:
            attn = GroupAttention(self.dim, self.num_heads, self.ws, dtype=self.dtype, name="attn")

        def dp(v):
            if deterministic or self.drop_path_rate == 0.0:
                return v
            rng = self.make_rng("droppath")
            return drop_path(v, self.drop_path_rate, deterministic, rng)

        x = x + dp(attn(nn.LayerNorm(dtype=self.dtype, name="norm1")(x)))
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(h)
        return x + dp(h)


class PatchEmbed(nn.Module):
    dim: int
    patch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # [B, H, W, C] -> [B, H/p, W/p, dim]
        x = nn.Conv(self.dim, (self.patch, self.patch), strides=self.patch,
                    padding="VALID", dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class ALTGVT(nn.Module):
    """Alternating local/global Twins backbone -> 4 pyramid feature maps."""

    embed_dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    depths: Sequence[int] = (2, 2, 10, 4)
    wss: Sequence[int] = (7, 7, 7, 7)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_size: int = 4
    drop_path_rate: float = 0.2
    dtype: Dtype = jnp.bfloat16
    fused_attn: bool = False  # ModelConfig.fused_gsa (Pallas GSA kernel)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, H, W, 3] -> list of 4 NHWC maps at 1/4, 1/8, 1/16, 1/32 of x."""
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outputs = []
        cur = 0
        for i, depth in enumerate(self.depths):
            x = PatchEmbed(
                self.embed_dims[i],
                self.patch_size if i == 0 else 2,
                dtype=self.dtype,
                name=f"patch_embed{i}",
            )(x)
            for j in range(depth):
                x = TwinsBlock(
                    self.embed_dims[i], self.num_heads[i], self.mlp_ratios[i],
                    ws=1 if j % 2 == 1 else self.wss[i],
                    sr_ratio=self.sr_ratios[i],
                    drop_path_rate=dpr[cur + j],
                    dtype=self.dtype,
                    fused_attn=self.fused_attn,
                    name=f"block{i}_{j}",
                )(x, deterministic)
                if j == 0:
                    x = PosCNN(self.embed_dims[i], dtype=self.dtype,
                               name=f"pos_block{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"stage_norm{i}")(x)
            outputs.append(x)
            cur += depth
        return outputs


def alt_gvt_small(dtype=jnp.bfloat16, drop_path_rate=0.2,
                  fused_attn=False) -> ALTGVT:
    return ALTGVT(embed_dims=(64, 128, 256, 512), num_heads=(2, 4, 8, 16),
                  depths=(2, 2, 10, 4), drop_path_rate=drop_path_rate,
                  dtype=dtype, fused_attn=fused_attn)


def alt_gvt_base(dtype=jnp.bfloat16, drop_path_rate=0.2,
                 fused_attn=False) -> ALTGVT:
    return ALTGVT(embed_dims=(96, 192, 384, 768), num_heads=(3, 6, 12, 24),
                  depths=(2, 2, 18, 2), drop_path_rate=drop_path_rate,
                  dtype=dtype, fused_attn=fused_attn)


def alt_gvt_large(dtype=jnp.bfloat16, drop_path_rate=0.3,
                  fused_attn=False) -> ALTGVT:
    return ALTGVT(embed_dims=(128, 256, 512, 1024), num_heads=(4, 8, 16, 32),
                  depths=(2, 2, 18, 2), drop_path_rate=drop_path_rate,
                  dtype=dtype, fused_attn=fused_attn)
