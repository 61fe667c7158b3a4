"""Cascade MVS models: TwinMVSNet (MVSFormer) and DINOMVSNet (MVSFormer-P).

Functional spec: /root/reference/models/mvsformer_model.py:163-449 — a
feature pyramid from FPN encoder + ViT backbone fused by a decoder, then a
4-stage coarse-to-fine cascade of StageNets with inverse-depth (or metric)
hypothesis scheduling and stage-averaged confidence.

TPU-first notes: views are batched through the backbone as B*V (one big MXU
batch) for both train and eval — XLA rematerialization (jax.checkpoint on the
backbone) replaces the reference's eval-time python view loop as the memory
valve. Images are NHWC.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvsformer_tpu.config import ModelConfig
from mvsformer_tpu.models import twins as twins_lib
from mvsformer_tpu.models.decoders import TwinDecoderStage4, TwinDecoderStage4V2
from mvsformer_tpu.models.fpn import FPNDecoder, FPNDecoderV2, FPNEncoder
from mvsformer_tpu.models.stagenet import StageNet
from mvsformer_tpu.ops import hypotheses
from mvsformer_tpu.ops.resize import resize_bicubic, resize_nearest

Dtype = Any

STAGE_SCALES = (8, 4, 2, 1)  # stage1..stage4 feature-map downscale factors


def extract_view_features(model, imgs, training: bool, chunk: int):
    """Per-stage feature maps [B,V,h,w,c] from imgs [B,V,H,W,3] via
    model.extract_features.

    At eval with 0 < chunk < V the backbone runs over view chunks so only
    `chunk` views' backbone activations are live at once — the TPU HBM valve
    replacing the reference's eval-time python view loop
    (mvsformer_model.py:379-399); XLA schedules the independent chunk calls
    sequentially (liveness-minimal)."""
    B, V, H, W, _ = imgs.shape
    if not training and chunk and chunk < V:
        per_stage = None
        for v0 in range(0, V, chunk):
            cv = min(chunk, V - v0)
            sub = imgs[:, v0:v0 + cv].reshape(B * cv, H, W, 3).astype(model.dtype)
            fs = model.extract_features(sub, training)
            fs = [f.reshape(B, cv, f.shape[1], f.shape[2], f.shape[3]) for f in fs]
            per_stage = fs if per_stage is None else [
                jnp.concatenate([a, b], axis=1) for a, b in zip(per_stage, fs)]
        return per_stage
    flat = imgs.reshape(B * V, H, W, 3).astype(model.dtype)
    feats = model.extract_features(flat, training)
    return [f.reshape(B, V, f.shape[1], f.shape[2], f.shape[3]) for f in feats]


def fused_ok() -> bool:
    """The Pallas fused warp kernel only lowers on real TPU backends; CPU
    tests and the forced-host mesh use the XLA path."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


class TwinMVSNet(nn.Module):
    """MVSFormer main variant: Twins ALTGVT backbone + FPN cascade."""

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
        if cfg.multi_scale:
            self.decoder = FPNDecoderV2(feat_chs=tuple(cfg.feat_chs), norm=cfg.norm_type,
                                        dtype=self.dtype, axis_name=self.axis_name)
            self.decoder_vit = TwinDecoderStage4V2(out_ch=cfg.vit_args.out_ch,
                                                   norm=cfg.norm_type, dtype=self.dtype,
                                                   axis_name=self.axis_name)
        else:
            self.decoder = FPNDecoder(feat_chs=tuple(cfg.feat_chs), norm=cfg.norm_type,
                                      dtype=self.dtype, axis_name=self.axis_name,
                                      use_fused_level=cfg.fused_fpn,
                                      collapse_last=cfg.fpn_collapse,
                                      fused_final=cfg.fused_fpn_final,
                                      fused_l2=cfg.fused_fpn_l2)
            self.decoder_vit = TwinDecoderStage4(out_ch=cfg.vit_args.out_ch,
                                                 norm=cfg.norm_type, dtype=self.dtype,
                                                 axis_name=self.axis_name)
        arch = cfg.vit_args.vit_arch
        builder = {
            "alt_gvt_small": twins_lib.alt_gvt_small,
            "alt_gvt_base": twins_lib.alt_gvt_base,
            "alt_gvt_large": twins_lib.alt_gvt_large,
        }[arch]
        kwargs = {}
        if cfg.vit_args.drop_path_rate is not None:
            kwargs["drop_path_rate"] = cfg.vit_args.drop_path_rate
        self.vit = builder(dtype=self.dtype,
                           fused_attn=cfg.fused_gsa and fused_ok(), **kwargs)
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
        """imgs [N, H, W, 3] -> per-stage feature maps (stage1..4 at 1/8..1/1)."""
        cfg = self.cfg
        conv01, conv11, conv21, conv31 = self.encoder(imgs, training)
        vit_h = int(imgs.shape[1] * cfg.vit_args.rescale)
        vit_w = int(imgs.shape[2] * cfg.vit_args.rescale)
        vit_imgs = resize_bicubic(imgs.astype(jnp.float32), (vit_h, vit_w),
                                  spatial_axes=(1, 2)).astype(self.dtype)
        det = not training or cfg.fix
        if cfg.remat_backbone and training and not cfg.fix:
            # Rematerialize the backbone in the backward pass: the TPU-native
            # replacement for the reference's eval-time view loop as the
            # memory valve (trades backbone recompute for activation memory
            # at large multi-scale crops).
            vit_feats = nn.remat(
                lambda mdl, xi: mdl(xi, deterministic=det))(self.vit, vit_imgs)
        else:
            vit_feats = self.vit(vit_imgs, deterministic=det)
        if cfg.fix:
            vit_feats = [jax.lax.stop_gradient(v) for v in vit_feats]
        if cfg.multi_scale:
            vit1, vit2, vit3 = self.decoder_vit(*vit_feats, training=training)
            feats = self.decoder(conv01, conv11, conv21, conv31, vit1, vit2, vit3,
                                 training=training)
        else:
            vit_out = self.decoder_vit(*vit_feats, training=training)
            conv31 = conv31 + vit_out
            feats = self.decoder(conv01, conv11, conv21, conv31, training=training)
        # decoder returns (stage1 @1/8, stage2 @1/4, stage3 @1/2, stage4 @1/1)
        return feats

    def __call__(self, imgs, proj_matrices, depth_values, training: bool = False,
                 tmp=2.0):
        """imgs [B, V, H, W, 3]; proj_matrices {stageK: [B, V, 2, 4, 4]};
        depth_values [B, Dfull]; tmp: float or per-stage list."""
        cfg = self.cfg
        B, V, H, W, _ = imgs.shape
        depth_interval = depth_values[:, 1] - depth_values[:, 0]

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

            if cfg.depth_type in ("ce", "mixup_ce"):
                conf = prev["photometric_confidence"]
                if conf.shape[1] != H or conf.shape[2] != W:
                    conf = resize_nearest(conf, (H, W), spatial_axes=(1, 2))
                conf_sum = conf_sum + conf

        outputs["refined_depth"] = prev["depth"]
        if cfg.depth_type in ("ce", "mixup_ce"):
            outputs["photometric_confidence"] = conf_sum / len(cfg.ndepths)
        else:
            outputs["photometric_confidence"] = prev["photometric_confidence"]
        return outputs


def build_model(cfg: ModelConfig, dtype=jnp.bfloat16, axis_name=None,
                view_axis=None, depth_sharding=None):
    """Model factory keyed on cfg.model_type.

    depth_sharding: optional NamedSharding(mesh, P(None, "depth")) enabling
    depth-slab GSPMD sharding of the cost volumes (pair with shard_map
    axis_names that leave "depth" automatic).
    """
    import os

    from mvsformer_tpu.models.blocks import configure_smallconv
    from mvsformer_tpu.ops.pallas import warp_corr

    configure_smallconv(cfg.smallconv_modes, cfg.smallconv_s1cap)
    warp_corr.configure(cfg.warp_rows)
    env = os.environ.get("MVSTPU_CORR_BF16")
    if env is not None:  # env override, matching the other routing knobs
        cfg.corr_bf16 = env == "1"
    env = os.environ.get("MVSTPU_MV_FUSED")
    if env is not None:
        cfg.mv_fused = env == "1"
    env = os.environ.get("MVSTPU_WARP_UNION")
    if env is not None:
        cfg.warp_union_extra = int(env)
    env = os.environ.get("MVSTPU_FPN_FINAL")
    if env is not None:
        cfg.fused_fpn_final = env == "1"
    env = os.environ.get("MVSTPU_ENC_HEAD")
    if env is not None:
        cfg.fused_enc_head = env == "1"
    env = os.environ.get("MVSTPU_FPN_L2")
    if env is not None:
        cfg.fused_fpn_l2 = env == "1"
    env = os.environ.get("MVSTPU_TAIL")
    if env is not None:
        cfg.fused_stage_tail = env == "1"
    env = os.environ.get("MVSTPU_FPN_COLLAPSE")
    if env is not None:
        cfg.fpn_collapse = env == "1"
    env = os.environ.get("MVSTPU_PACKED_TRAIN")
    if env is not None:
        cfg.packed_train_costreg = env == "1"
    env = os.environ.get("MVSTPU_GSA")
    if env is not None:
        cfg.fused_gsa = env == "1"
    if cfg.model_type == "twin":
        return TwinMVSNet(cfg, dtype=dtype, axis_name=axis_name,
                          view_axis=view_axis, depth_sharding=depth_sharding)
    if cfg.model_type == "dino":
        from mvsformer_tpu.models.dino import DINOMVSNet

        return DINOMVSNet(cfg, dtype=dtype, axis_name=axis_name,
                          view_axis=view_axis, depth_sharding=depth_sharding)
    raise ValueError(f"unknown model_type {cfg.model_type}")
