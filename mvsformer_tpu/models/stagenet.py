"""One cascade stage: plane-sweep cost volume + visibility fusion + 3D
regularization + depth decode.

Functional spec: /root/reference/models/mvsformer_model.py:26-160 (StageNet).

TPU-first notes:
- The per-source-view loop accumulates `volume_sum`/`vis_sum` running sums —
  associative reductions. When `view_axis` is set (shard_map over the "view"
  mesh axis), each device processes only its local source views and the sums
  are completed with a single `lax.psum`, reproducing the serial result
  exactly. This is the scaling headroom the reference lacks (SURVEY.md 5.7).
- Correlation/softmax/decode are fp32 islands (reference forces fp32 via
  autocast(enabled=False), mvsformer_model.py:65-68); the 3D U-Net runs in the
  compute dtype (bf16 by default).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvsformer_tpu.models.blocks import ConvBnReLU
from mvsformer_tpu.models.costreg import CostRegNet, CostRegNet2D, CostRegNet3D
from mvsformer_tpu.ops import correlation as corr_ops
from mvsformer_tpu.ops import geometry, regression
from mvsformer_tpu.ops.smallconv import SmallConv

Dtype = Any

# Optional debug overrides for the matching ModelConfig fields, read once at
# import so traced variants can't silently diverge from a changed env var.
_FUSED_VIS_ENV = os.environ.get("MVSTPU_FUSED_VIS")


class VisibilityNet(nn.Module):
    """Entropy -> per-pixel visibility weight CNN (mvsformer_model.py:37).

    At BN-norm inference on TPU the whole stack runs as ONE Pallas kernel
    (ops/pallas/vis_net.py) — its 8/16-channel full-resolution intermediates
    otherwise dominate HBM traffic (~13 ms/frame profiled). Training, GN
    configs, and CPU keep the flax path; both consume the same param tree.
    """

    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None
    use_fused: bool = True  # ModelConfig.fused_vis (MVSTPU_FUSED_VIS wins)

    @nn.compact
    def __call__(self, entropy, training: bool = False):
        B, H, W, _ = entropy.shape
        fused_wanted = (self.use_fused if _FUSED_VIS_ENV is None
                        else _FUSED_VIS_ENV == "1")
        use_kernel = (
            fused_wanted
            and not training and self.norm == "BN"
            and not self.is_initializing()
            and H >= 24 and H % 8 == 0 and W % 128 == 0
            and jax.devices()[0].platform == "tpu"
        )
        if use_kernel:
            from mvsformer_tpu.ops.pallas.vis_net import fused_visibility

            p = self.variables["params"]
            bs = self.variables["batch_stats"]

            def st(c):
                bn_p = p[c]["Norm_0"]["BatchNorm_0"]
                bn_s = bs[c]["Norm_0"]["BatchNorm_0"]
                return (bn_p["scale"], bn_p["bias"],
                        bn_s["mean"], bn_s["var"])

            w = fused_visibility(
                entropy[..., 0].astype(jnp.float32),
                p["conv0"]["Conv_0"]["kernel"], p["conv1"]["Conv_0"]["kernel"],
                p["conv2"]["Conv_0"]["kernel"],
                p["conv3"]["kernel"], p["conv3"]["bias"],
                (st("conv0"), st("conv1"), st("conv2")))
            return w[..., None]
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        x = ConvBnReLU(16, **kw, name="conv0")(entropy, training)
        x = ConvBnReLU(16, **kw, name="conv1")(x, training)
        x = ConvBnReLU(8, **kw, name="conv2")(x, training)
        x = SmallConv(1, (1, 1), dtype=self.dtype, name="conv3")(x)
        return nn.sigmoid(x.astype(jnp.float32))


class StageNet(nn.Module):
    ndepth: int
    stage_idx: int
    base_ch: int = 8  # correlation groups G == cost-reg input channels
    fusion_type: str = "cnn"  # cnn | epipole | epipoleV2
    depth_type: str = "ce"
    model_th: int = 8
    attn_temp: float = 2.0
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None  # batch axis (BN sync)
    view_axis: str | None = None  # mesh axis the source views are sharded over
    use_fused_warp: bool = False  # Pallas fused warp+corr (eval path, TPU)
    fused_band_rows: int = 12
    fused_variant: int = 1  # 1 = row-batched, 2 = transpose-free, 3 = +row-windows
    fused_train_warp: bool = False
    fused_native_bwd: bool = True  # Pallas bwd kernel vs XLA-recompute VJP
    fused_bf16_band: bool = False  # bf16 band + tent weights (fp32 accum)
    fused_vis: bool = True  # fused VisibilityNet kernel (ModelConfig.fused_vis)
    mv_fused: bool = True  # all-views-in-one-pallas-call path (v4+cnn eval);
    # False falls back to the per-view kernel loop (A/B + tests)
    union_extra: int = -1  # ModelConfig.warp_union_extra (v4 union-band DMA)
    fused_tail: bool = False  # ModelConfig.fused_stage_tail: eval ce/was
    # depth decode (softmax + temperature regression + confidence) as one
    # Pallas pass over the logit volume (ops/pallas/stage_tail.py)
    corr_bf16: bool = False  # store per-view correlation volumes in bf16 on
    # the fused eval path (f32 in-kernel accumulation, one rounding at the
    # store; the weighted view sum still accumulates in f32). Halves the HBM
    # footprint/traffic of the largest eval buffers. ModelConfig.corr_bf16.
    packed_train: bool = False  # ModelConfig.packed_train_costreg: depth-pack
    # the TRAIN-mode cost-reg U-Nets too (real BN stats in packed space)
    # Optional NamedSharding for depth-hypothesis-slab sharding of the cost
    # volume over the mesh's "depth" axis. The constraint makes GSPMD shard
    # the 3D cost-regularization U-Net along D (halo exchanges for the 3x3x3
    # convs are inserted automatically); the warp/correlation upstream
    # propagates to per-slab compute. SURVEY.md section 5.7's depth-slab plan.
    depth_sharding: Any = None

    @nn.compact
    def __call__(
        self,
        ref_feat,  # [B, H, W, C]
        src_feats,  # [B, Vs, H, W, C] (local source views when view-sharded)
        ref_proj,  # [B, 2, 4, 4]
        src_projs,  # [B, Vs, 2, 4, 4]
        depth_values,  # [B, D, H, W]
        training: bool = False,
        tmp: float = 2.0,
        want_similarity: bool = False,
    ):
        B, H, W, C = ref_feat.shape
        Vs = src_feats.shape[1]
        G = self.base_ch

        ref_proj_full = geometry.compose_projection(ref_proj.astype(jnp.float32))
        ref32 = ref_feat.astype(jnp.float32)

        # Per-view correlation volumes and visibility weights are collected
        # and reduced in ONE weighted-sum pass after the loop (each view's
        # weight needs that view's full volume first — entropy -> vis CNN —
        # so per-view running sums would re-read and re-write the f32
        # accumulator once per view; the post-loop sum reads every volume
        # once and writes the accumulator once). Summation order matches the
        # reference's sequential accumulation (mvsformer_model.py:101-105).
        corrs, ws = [], []
        sim_sum = jnp.zeros((B, depth_values.shape[1], H, W), jnp.float32)

        if self.fusion_type == "cnn":
            vis_net = VisibilityNet(norm=self.norm, dtype=self.dtype,
                                    axis_name=self.axis_name,
                                    use_fused=self.fused_vis, name="vis")
        elif self.fusion_type == "epipoleV2":
            attn_temp = self.param("attn_temp", lambda k: jnp.float32(1.0))

        # The Pallas fused path computes the correlation without ever
        # materializing the warped volume; the similarity diagnostic needs the
        # raw warp, so it forces the XLA path.
        fused = self.use_fused_warp and not training and not want_similarity
        fused_train = (self.use_fused_warp and self.fused_train_warp
                       and training and not want_similarity)

        dv32 = depth_values.astype(jnp.float32)

        # All-views-in-one-call fast path (v4 + cnn fusion, eval): the
        # runtime charges a large fixed cost per in-model pallas_call
        # (docs/DESIGN.md round-3 DMA wall — ~2 ms/call regardless of size),
        # so the per-view python loop pays it Vs times per stage. The _mv
        # wrapper folds views into the kernel's batch grid dim (16 -> 4 warp
        # calls and 16 -> 4 vis-net calls per frame); numerics identical.
        if (fused and self.mv_fused and self.fused_variant == 4
                and self.fusion_type == "cnn"):
            from mvsformer_tpu.ops.pallas import warp_corr as wc

            src_projs_full = geometry.compose_projection(
                src_projs.reshape(B * Vs, 2, 4, 4).astype(jnp.float32)
            ).reshape(B, Vs, 4, 4)
            kw = {}
            if self.corr_bf16:
                kw["out_dtype"] = jnp.bfloat16
            if self.union_extra >= 0:
                kw["union_extra"] = self.union_extra
            corr_all, ent_all = wc.plane_sweep_group_corr_v4_mv(
                ref32, src_feats.astype(jnp.float32), src_projs_full,
                ref_proj_full, dv32, groups=G,
                band_rows=self.fused_band_rows,
                bf16_band=self.fused_bf16_band, want_entropy=True, **kw)
            w_all = vis_net(
                ent_all.reshape(B * Vs, H, W, 1).astype(self.dtype),
                training)  # [B*Vs, H, W, 1] fp32
            w_all = w_all[..., 0].reshape(B, Vs, H, W)
            volume_sum = jnp.sum(
                corr_all.astype(jnp.float32)
                * w_all[:, :, None, :, :, None], axis=1)
            vis_sum = jnp.sum(w_all, axis=1)[:, None]  # [B, 1, H, W]
            return self._tail(volume_sum, vis_sum, sim_sum, dv32, B, H, W,
                              training, tmp, want_similarity)

        for v in range(Vs):
            ent_k = None  # in-kernel entropy (v4 cnn path only)
            src_proj_full = geometry.compose_projection(src_projs[:, v].astype(jnp.float32))
            if fused:
                from mvsformer_tpu.ops.pallas import warp_corr as wc

                # v4 computes coordinates AND the frustum/window mask
                # in-kernel (zeroed pixels come back pre-masked, invalid is
                # None); epipoleV2 consumes the mask itself to downweight
                # clipped pixels, so it stays on v3.
                variant = self.fused_variant
                if variant == 4 and self.fusion_type == "epipoleV2":
                    variant = 3
                kernel_fn = {
                    2: wc.plane_sweep_group_corr_v2,
                    3: wc.plane_sweep_group_corr_v3,
                    4: wc.plane_sweep_group_corr_v4,
                }.get(variant, wc.plane_sweep_group_corr)
                # epipoleV2 consumes the invalid mask directly (downweights
                # clipped pixels). v3's per-row KR=4 window is much narrower
                # than v1/v2's band, so for the other fusion types the mask is
                # still requested and window-clipped pixels are zeroed — the
                # same treatment the XLA path gives frustum-OOB pixels —
                # instead of silently carrying corrupted correlation values.
                need_invalid = variant != 4 and (
                    self.fusion_type == "epipoleV2" or variant == 3)
                kw = {}
                if variant in (3, 4) and self.corr_bf16:
                    kw["out_dtype"] = jnp.bfloat16
                if variant == 4 and self.union_extra >= 0:
                    kw["union_extra"] = self.union_extra
                ent_k = None
                if variant == 4 and self.fusion_type == "cnn":
                    # v4 streams the visibility entropy out of the kernel
                    # while the correlation volume is still in registers —
                    # entropy_over_depth's full volume re-read disappears.
                    kw["want_entropy"] = True
                    corr, ent_k, invalid = kernel_fn(
                        ref32, src_feats[:, v].astype(jnp.float32),
                        src_proj_full, ref_proj_full, dv32, groups=G,
                        band_rows=self.fused_band_rows,
                        want_invalid=need_invalid,
                        bf16_band=self.fused_bf16_band, **kw)
                    ent_k = ent_k[..., None]  # [B,H,W,1]
                else:
                    corr, invalid = kernel_fn(
                        ref32, src_feats[:, v].astype(jnp.float32),
                        src_proj_full, ref_proj_full, dv32, groups=G,
                        band_rows=self.fused_band_rows,
                        want_invalid=need_invalid,
                        bf16_band=self.fused_bf16_band, **kw)
                if (variant == 3
                        and self.fusion_type != "epipoleV2"
                        and invalid is not None):
                    corr = corr * (1.0 - invalid[..., None])
            elif fused_train:
                import os

                from mvsformer_tpu.ops.pallas.warp_corr_train import (
                    fused_warp_corr_train,
                )

                # Training maps v4 -> v3 by default: the backward is the v3
                # band adjoint either way, and the v5e sweep (2026-08-20,
                # BENCH_DETAILS train_v3_kbwd vs train_v4_kbwd) measured the
                # v3 training warp at 8.19 pipelined steps/s vs v4's 6.91 —
                # v4's in-kernel coordinate/entropy extras don't pay in the
                # training forward. MVSTPU_TRAIN_WARP_VARIANT=4 forces true
                # v4 for re-measurement on future toolchains.
                tv = self.fused_variant
                if tv == 4:
                    tv = int(os.environ.get("MVSTPU_TRAIN_WARP_VARIANT", "3"))
                corr = fused_warp_corr_train(
                    ref32, src_feats[:, v].astype(jnp.float32), src_proj_full,
                    ref_proj_full, dv32, G, self.fused_band_rows,
                    tv, self.fused_native_bwd)
                invalid = None
                if self.fusion_type == "epipoleV2":
                    _, _, invalid = geometry.plane_sweep_coords(
                        src_proj_full, ref_proj_full, dv32, H, W)
                    invalid = jax.lax.stop_gradient(
                        invalid.reshape(B, dv32.shape[1], H, W))
            else:
                warped, invalid = geometry.homo_warp(
                    src_feats[:, v].astype(jnp.float32), src_proj_full,
                    ref_proj_full, dv32)
                corr = corr_ops.groupwise_correlation(ref32, warped, G)

            if want_similarity:
                sim_sum = sim_sum + corr_ops.cosine_similarity_volume(ref32, warped, G)

            if self.fusion_type == "cnn":
                ent = ent_k if ent_k is not None \
                    else corr_ops.entropy_over_depth(corr)  # [B,H,W,1]
                w = vis_net(ent.astype(self.dtype), training)  # [B,H,W,1] fp32
                w = w[..., 0][:, None]  # [B,1,H,W] — broadcasts over D and G
            elif self.fusion_type == "epipole":
                w = corr_ops.epipole_weight(corr, self.attn_temp, C)  # [B,D,H,W]
            elif self.fusion_type == "epipoleV2":
                w = corr_ops.epipole_v2_weight(corr, attn_temp, invalid, G)
            else:
                raise NotImplementedError(self.fusion_type)
            corrs.append(corr)
            ws.append(w)

        volume_sum = corrs[0].astype(jnp.float32) * ws[0][..., None]
        vis_sum = ws[0]
        for v in range(1, Vs):
            volume_sum = volume_sum + corrs[v].astype(jnp.float32) * ws[v][..., None]
            vis_sum = vis_sum + ws[v]
        del corrs, ws
        return self._tail(volume_sum, vis_sum, sim_sum, dv32, B, H, W,
                          training, tmp, want_similarity)

    def _tail(self, volume_sum, vis_sum, sim_sum, dv32, B, H, W,
              training, tmp, want_similarity):
        """Shared stage tail: view reduce -> cost reg -> depth decode.
        (Helper of the compact __call__; submodules created here live in the
        same scope, names unchanged.)"""
        if self.view_axis is not None:
            volume_sum = jax.lax.psum(volume_sum, self.view_axis)
            vis_sum = jax.lax.psum(vis_sum, self.view_axis)
            if want_similarity:
                sim_sum = jax.lax.psum(sim_sum, self.view_axis)

        volume_mean = volume_sum / (vis_sum[..., None] + 1e-6)
        if self.depth_sharding is not None:
            volume_mean = jax.lax.with_sharding_constraint(
                volume_mean, self.depth_sharding)

        # 3D regularization in compute dtype.
        if self.fusion_type == "epipole":
            reg = CostRegNet2D(self.base_ch, norm=self.norm, dtype=self.dtype,
                               axis_name=self.axis_name, name="cost_reg")
        elif self.fusion_type == "epipoleV2" or self.ndepth <= self.model_th:
            reg = CostRegNet3D(self.base_ch, norm=self.norm, dtype=self.dtype,
                               axis_name=self.axis_name,
                               packed_train=self.packed_train, name="cost_reg")
        else:
            reg = CostRegNet(self.base_ch, norm=self.norm, dtype=self.dtype,
                             axis_name=self.axis_name,
                             packed_train=self.packed_train, name="cost_reg")
        logits = reg(volume_mean.astype(self.dtype), training)[..., 0]  # [B,D,H,W]
        logits = logits.astype(jnp.float32)
        prob = jax.nn.softmax(logits, axis=1)

        if (self.fused_tail and not training
                and self.depth_type in ("ce", "was")):
            from mvsformer_tpu.ops.pallas.stage_tail import fused_depth_decode

            depth, conf = fused_depth_decode(logits, dv32, tmp)
            conf = jax.lax.stop_gradient(conf)
        else:
            depth, conf = regression.decode_depth(
                logits, prob, dv32, self.depth_type, self.ndepth, training,
                tmp)

        out = {
            "depth": depth,
            "prob_volume": prob,
            "prob_volume_pre": logits,
            "photometric_confidence": conf,
            "depth_values": dv32,
        }
        if want_similarity:
            sim_idx = jnp.argmax(sim_sum, axis=1)
            out["sim_depth"] = jnp.take_along_axis(dv32, sim_idx[:, None], axis=1)[:, 0]
        return out
