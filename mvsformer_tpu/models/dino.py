"""DINO ViT backbone + DINOMVSNet (MVSFormer-P variant).

Functional spec: /root/reference/models/vision_transformer.py (timm-style
ViT-small: patch 16, embed 384, 12 blocks, 6 heads; bicubic pos-embed
interpolation for arbitrary resolution :396-416; `forward_with_last_att`
returning tokens + the last block's attention map :442-451; log-N qk-scale
option :142-146) and mvsformer_model.py:163-308 (DINOMVSNet cascade wiring
with CLS-attention fusion).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvsformer_tpu.config import ModelConfig
from mvsformer_tpu.models.decoders import (
    VITDecoderStage4,
    VITDecoderStage4NoAtt,
    VITDecoderStage4Single,
)
from mvsformer_tpu.models.fpn import FPNDecoder, FPNDecoderV2, FPNEncoder
from mvsformer_tpu.models.stagenet import StageNet
from mvsformer_tpu.models.mvsformer import fused_ok
from mvsformer_tpu.ops import hypotheses
from mvsformer_tpu.ops.resize import resize_bicubic, resize_nearest

Dtype = Any


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    qk_scale: str | float = "default"  # "default" or base for log-N scaling
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, return_attention: bool = False):
        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Dense(C * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = hd ** -0.5
        if self.qk_scale != "default":
            # log-N scale with base (224/patch)^2 (vision_transformer.py:142-146)
            scale = math.log(N, float(self.qk_scale) ** 2 + 1) * scale
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        if return_attention:
            return out, attn
        return out


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qk_scale: str | float = "default"
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attention: bool = False):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        attn_out = ViTAttention(self.dim, self.num_heads, self.qk_scale,
                                dtype=self.dtype, name="attn")(h, return_attention)
        att = None
        if return_attention:
            attn_out, att = attn_out
        x = x + attn_out
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        x = x + h
        if return_attention:
            return x, att
        return x


class DINOViT(nn.Module):
    """ViT with CLS token and resolution-adaptive positional embedding.

    Optional cross-view linear attention (vision_transformer.py:375-443):
    when `cross_att`, a CrossBlock runs after every depth//cross_num blocks,
    mixing information across the V views of each sample.
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    qk_scale: str | float = "default"
    pretrain_grid: int = 14  # 224/16 — grid the pretrained pos-embed lives on
    cross_att: bool = False
    cross_num: int = 4
    nview: int = 5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True, epipoles=None):
        """x: [B, H, W, 3] -> (tokens [B, 1+N, C] after final norm,
        last-block attention [B, nh, 1+N, 1+N])."""
        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        patches = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                          strides=self.patch_size, padding="VALID",
                          dtype=self.dtype, name="patch_embed")(x)
        tokens = patches.reshape(B, gh * gw, self.embed_dim)

        cls_token = self.param("cls_token",
                               nn.initializers.truncated_normal(0.02),
                               (1, 1, self.embed_dim))
        pos_embed = self.param("pos_embed",
                               nn.initializers.truncated_normal(0.02),
                               (1, self.pretrain_grid * self.pretrain_grid + 1,
                                self.embed_dim))

        # Bicubic pos-embed interpolation to the actual grid
        # (vision_transformer.py:396-416).
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:].reshape(
            1, self.pretrain_grid, self.pretrain_grid, self.embed_dim)
        if (gh, gw) != (self.pretrain_grid, self.pretrain_grid):
            patch_pos = resize_bicubic(patch_pos.astype(jnp.float32), (gh, gw),
                                       spatial_axes=(1, 2))
        patch_pos = patch_pos.reshape(1, gh * gw, self.embed_dim)

        cls = jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)).astype(self.dtype)
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + jnp.concatenate([cls_pos, patch_pos], axis=1).astype(self.dtype)

        att = None
        cross_inter = self.depth // self.cross_num if self.cross_att else 0
        for i in range(self.depth):
            blk = ViTBlock(self.embed_dim, self.num_heads, qk_scale=self.qk_scale,
                           dtype=self.dtype, name=f"block{i}")
            if i < self.depth - 1:
                tokens = blk(tokens, deterministic)
            else:
                tokens, att = blk(tokens, deterministic, return_attention=True)
            if self.cross_att and (i + 1) % cross_inter == 0:
                from mvsformer_tpu.models.cross_attention import CrossBlock

                tokens = CrossBlock(
                    self.embed_dim, self.num_heads, nview=self.nview,
                    dtype=self.dtype,
                    name=f"cross_block{(i + 1) // cross_inter - 1}",
                )(tokens, epipoles, gh, gw)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm")(tokens)
        return tokens, att


def vit_small(patch_size=16, qk_scale="default", dtype=jnp.bfloat16,
              cross_att=False, nview=5) -> DINOViT:
    return DINOViT(embed_dim=384, depth=12, num_heads=6, patch_size=patch_size,
                   qk_scale=qk_scale, cross_att=cross_att, nview=nview, dtype=dtype)


def vit_base(patch_size=16, qk_scale="default", dtype=jnp.bfloat16,
             cross_att=False, nview=5) -> DINOViT:
    return DINOViT(embed_dim=768, depth=12, num_heads=12, patch_size=patch_size,
                   qk_scale=qk_scale, cross_att=cross_att, nview=nview, dtype=dtype)


class DINOMVSNet(nn.Module):
    """MVSFormer-P: frozen-DINO features + CLS-attention fusion cascade."""

    cfg: ModelConfig
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None
    view_axis: str | None = None
    depth_sharding: Any = None

    def setup(self):
        cfg = self.cfg
        self.encoder = FPNEncoder(feat_chs=tuple(cfg.feat_chs), norm=cfg.norm_type,
                                  dtype=self.dtype, axis_name=self.axis_name,
                                  fused_head=(cfg.fused_enc_head
                                              and cfg.fused_fpn_final
                                              and not cfg.multi_scale))
        va = cfg.vit_args
        vit_ch = va.vit_ch if isinstance(va.vit_ch, int) else 384
        if cfg.multi_scale:
            self.decoder = FPNDecoderV2(feat_chs=tuple(cfg.feat_chs), norm=cfg.norm_type,
                                        dtype=self.dtype, axis_name=self.axis_name)
        else:
            self.decoder = FPNDecoder(feat_chs=tuple(cfg.feat_chs), norm=cfg.norm_type,
                                      dtype=self.dtype, axis_name=self.axis_name,
                                      use_fused_level=cfg.fused_fpn,
                                      collapse_last=cfg.fpn_collapse,
                                      fused_final=cfg.fused_fpn_final,
                                      fused_l2=cfg.fused_fpn_l2)
        if not va.att_fusion:
            self.decoder_vit = VITDecoderStage4NoAtt(out_ch=va.out_ch, vit_ch=vit_ch,
                                                     norm=cfg.norm_type, dtype=self.dtype,
                                                     axis_name=self.axis_name)
        elif cfg.multi_scale:
            self.decoder_vit = VITDecoderStage4(out_ch=va.out_ch, vit_ch=vit_ch,
                                                norm=cfg.norm_type, dtype=self.dtype,
                                                axis_name=self.axis_name)
        else:
            self.decoder_vit = VITDecoderStage4Single(out_ch=va.out_ch, vit_ch=vit_ch,
                                                      norm=cfg.norm_type, dtype=self.dtype,
                                                      axis_name=self.axis_name)
        builder = {"vit_small": vit_small, "vit_base": vit_base}[va.vit_arch]
        self.vit = builder(patch_size=va.patch_size, qk_scale=va.qk_scale,
                           dtype=self.dtype)
        self.fusions = [
            StageNet(
                ndepth=cfg.ndepths[i], stage_idx=i, base_ch=cfg.base_ch,
                fusion_type=cfg.fusion_type, depth_type=cfg.depth_type,
                model_th=cfg.model_th, attn_temp=cfg.attn_temp, norm=cfg.norm_type,
                dtype=self.dtype, axis_name=self.axis_name, view_axis=self.view_axis,
                use_fused_warp=cfg.use_fused_warp and fused_ok(),
                fused_band_rows=cfg.fused_band_rows,
                fused_variant=cfg.fused_variant,
                fused_train_warp=cfg.fused_train_warp,
                fused_native_bwd=cfg.fused_native_bwd,
                fused_bf16_band=cfg.fused_bf16_band,
                fused_vis=cfg.fused_vis,
                mv_fused=cfg.mv_fused,
                union_extra=cfg.warp_union_extra,
                fused_tail=cfg.fused_stage_tail and fused_ok(),
                corr_bf16=cfg.corr_bf16,
                packed_train=cfg.packed_train_costreg,
                depth_sharding=self.depth_sharding,
                name=f"stage{i + 1}",
            )
            for i in range(len(cfg.ndepths))
        ]

    def extract_features(self, imgs, training: bool):
        cfg = self.cfg
        va = cfg.vit_args
        conv01, conv11, conv21, conv31 = self.encoder(imgs, training)
        vit_h = int(imgs.shape[1] * va.rescale)
        vit_w = int(imgs.shape[2] * va.rescale)
        vit_imgs = resize_bicubic(imgs.astype(jnp.float32), (vit_h, vit_w),
                                  spatial_axes=(1, 2)).astype(self.dtype)
        det = not training or cfg.fix
        if cfg.remat_backbone and training and not cfg.fix:
            tokens, att = nn.remat(
                lambda mdl, xi: mdl(xi, deterministic=det))(self.vit, vit_imgs)
        else:
            tokens, att = self.vit(vit_imgs, deterministic=det)
        if cfg.fix:
            tokens = jax.lax.stop_gradient(tokens)
            att = jax.lax.stop_gradient(att)
        gh, gw = vit_h // va.patch_size, vit_w // va.patch_size
        vit_feat = tokens[:, 1:].reshape(imgs.shape[0], gh, gw, -1)
        # CLS-to-patch attention of the last block: [B, nh, gh, gw]
        cls_att = att[:, :, 0, 1:].reshape(imgs.shape[0], -1, gh, gw)
        cls_att = cls_att.transpose(0, 2, 3, 1).astype(self.dtype)  # NHWC

        if cfg.multi_scale:
            vit1, vit2, vit3 = self.decoder_vit(vit_feat, cls_att, training=training)
            feats = self.decoder(conv01, conv11, conv21, conv31, vit1, vit2, vit3,
                                 training=training)
        else:
            vit_out = self.decoder_vit(vit_feat, cls_att, training=training)
            conv31 = conv31 + vit_out
            feats = self.decoder(conv01, conv11, conv21, conv31, training=training)
        return feats

    def __call__(self, imgs, proj_matrices, depth_values, training: bool = False,
                 tmp=2.0):
        cfg = self.cfg
        B, V, H, W, _ = imgs.shape
        depth_interval = depth_values[:, 1] - depth_values[:, 0]

        from mvsformer_tpu.models.mvsformer import extract_view_features

        features = extract_view_features(self, imgs, training, cfg.eval_view_chunk)

        outputs = {}
        prev = None
        conf_sum = jnp.zeros((B, H, W), jnp.float32)
        for stage_idx, ndepth in enumerate(cfg.ndepths):
            feat = features[stage_idx]
            sh, sw = feat.shape[2], feat.shape[3]
            projs = proj_matrices[f"stage{stage_idx + 1}"]
            if stage_idx == 0:
                if cfg.inverse_depth and cfg.clamp_eth3d:
                    samples = hypotheses.init_inverse_range_clamped(
                        depth_values, ndepth, sh, sw)
                elif cfg.inverse_depth:
                    samples = hypotheses.init_inverse_range(depth_values, ndepth, sh, sw)
                else:
                    samples = hypotheses.init_range(depth_values, ndepth, sh, sw)
            else:
                prev_depth = jax.lax.stop_gradient(prev["depth"])
                if cfg.inverse_depth and cfg.clamp_eth3d:
                    samples = hypotheses.schedule_inverse_range_clamped(
                        prev_depth, prev["depth_values"], ndepth,
                        cfg.depth_interals_ratio[stage_idx], sh, sw)
                elif cfg.inverse_depth:
                    samples = hypotheses.schedule_inverse_range(
                        prev_depth, prev["depth_values"], ndepth,
                        cfg.depth_interals_ratio[stage_idx], sh, sw)
                else:
                    samples = hypotheses.schedule_range(
                        prev_depth, ndepth,
                        cfg.depth_interals_ratio[stage_idx] * depth_interval, sh, sw)

            stage_tmp = tmp[stage_idx] if isinstance(tmp, (list, tuple)) else tmp
            prev = self.fusions[stage_idx](
                feat[:, 0], feat[:, 1:], projs[:, 0], projs[:, 1:], samples,
                training=training, tmp=stage_tmp,
                want_similarity=not training and not (
                    cfg.use_fused_warp and fused_ok()),
            )
            outputs[f"stage{stage_idx + 1}"] = prev

            # DINOMVSNet always averages stage confidences (mvsformer_model.py:298-305)
            conf = prev["photometric_confidence"]
            if conf.shape[1] != H or conf.shape[2] != W:
                conf = resize_nearest(conf, (H, W), spatial_axes=(1, 2))
            conf_sum = conf_sum + conf

        outputs["refined_depth"] = prev["depth"]
        outputs["photometric_confidence"] = conf_sum / len(cfg.ndepths)
        return outputs
