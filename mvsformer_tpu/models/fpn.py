"""FPN feature encoder/decoders.

Functional spec: /root/reference/models/module.py:208-302 (FPNEncoder 4-level
conv pyramid; FPNDecoder top-down add with align_corners=True bilinear
upsampling; FPNDecoderV2 concat-with-ViT multi-scale variant). NHWC layout.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvsformer_tpu.models.blocks import (
    ConvNormAct, Deconv2dNormAct, MatmulConv1x1, Norm, swish)
from mvsformer_tpu.ops.fpn_collapse import collapsed_final_level
from mvsformer_tpu.ops.resize import resize_bilinear
from mvsformer_tpu.ops.smallconv import SmallConv

Dtype = Any

# Optional debug override for ModelConfig.fused_fpn, read once at import.
_FUSED_FPN_ENV = os.environ.get("MVSTPU_FUSED_FPN")


def _on_tpu() -> bool:
    """Kernel gates lower only on real TPU backends (tests monkeypatch this
    to exercise the fused paths in interpret mode on CPU)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


class FPNEncoder(nn.Module):
    feat_chs: Sequence[int] = (8, 16, 32, 64)
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None
    fused_head: bool = False  # ModelConfig.fused_enc_head: conv00 + conv01 +
    # downsample1 as ONE Pallas kernel (ops/pallas/encoder_head.py). When
    # active, the returned "conv01" is the (phase, c)-rows form
    # [N, H, 16, W/2] for the fused final-level kernel — pair both knobs.

    def _bn_fold(self, name):
        p = self.variables["params"][name]["Norm_0"]["BatchNorm_0"]
        s = self.variables["batch_stats"][name]["Norm_0"]["BatchNorm_0"]
        inv = jax.lax.rsqrt(s["var"].astype(jnp.float32) + 1e-5)
        mul = p["scale"].astype(jnp.float32) * inv
        add = (p["bias"].astype(jnp.float32)
               - s["mean"].astype(jnp.float32) * mul)
        return mul, add

    @nn.compact
    def __call__(self, x, training: bool = False):
        ch = self.feat_chs
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)
        use_head = (
            self.fused_head
            and not training and self.norm == "BN"
            and not self.is_initializing()
            and tuple(ch[:2]) == (8, 16)
            and x.shape[1] % 16 == 0 and x.shape[2] % 256 == 0
            and _on_tpu()
        )
        if use_head:
            from mvsformer_tpu.ops.pallas.encoder_head import encoder_head

            p = self.variables["params"]
            conv01, down0 = encoder_head(
                x.astype(self.dtype),
                p["conv00"]["Conv_0"]["kernel"], self._bn_fold("conv00"),
                p["conv01"]["Conv_0"]["kernel"], self._bn_fold("conv01"),
                p["downsample1"]["Conv_0"]["kernel"],
                self._bn_fold("downsample1"))
        else:
            conv00 = ConvNormAct(ch[0], kernel=7, **kw, name="conv00")(x, training)
            conv01 = ConvNormAct(ch[0], kernel=5, **kw, name="conv01")(conv00, training)
            down0 = ConvNormAct(ch[1], kernel=5, stride=2, **kw, name="downsample1")(conv01, training)
        conv10 = ConvNormAct(ch[1], **kw, name="conv10")(down0, training)
        conv11 = ConvNormAct(ch[1], **kw, name="conv11")(conv10, training)
        down1 = ConvNormAct(ch[2], kernel=5, stride=2, **kw, name="downsample2")(conv11, training)
        conv20 = ConvNormAct(ch[2], **kw, name="conv20")(down1, training)
        conv21 = ConvNormAct(ch[2], **kw, name="conv21")(conv20, training)
        down2 = ConvNormAct(ch[3], kernel=3, stride=2, **kw, name="downsample3")(conv21, training)
        conv30 = ConvNormAct(ch[3], **kw, name="conv30")(down2, training)
        conv31 = ConvNormAct(ch[3], **kw, name="conv31")(conv30, training)
        return conv01, conv11, conv21, conv31


class _OutBlock(nn.Module):
    features: int
    kernel: int = 3
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, training: bool = False, pre=None):
        # `pre`: externally computed pre-norm conv output (the collapsed
        # final-level path, ops/fpn_collapse.py) — skip the conv, keep the
        # Norm/activation so the variable tree is unchanged.
        if pre is not None:
            x = pre
        # Tiny-C_out convs (<=32) hit the channel-minor layout pathology;
        # reformulate as matmul+shift-add (ops/smallconv.py). name="Conv_0"
        # keeps the param tree byte-identical to the nn.Conv it replaces.
        elif self.features <= 32:
            x = SmallConv(self.features, (self.kernel, self.kernel),
                          dtype=self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        padding="SAME", dtype=self.dtype)(x)
        x = Norm(self.norm, dtype=self.dtype, axis_name=self.axis_name)(x, training)
        return swish(x)


class FPNDecoder(nn.Module):
    """Top-down add decoder -> (stage1..stage4) features at 1/8..1/1 res."""

    feat_chs: Sequence[int] = (8, 16, 32, 64)
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None
    use_fused_level: bool = False  # ModelConfig.fused_fpn (env wins)
    collapse_last: bool = False    # ModelConfig.fpn_collapse (default OFF:
    # documented net regression from layout retaliation — see config.py)
    fused_final: bool = False      # ModelConfig.fused_fpn_final: the final
    # level (up2 + inner3 + out3 conv/BN/swish) as ONE Pallas kernel
    # (ops/pallas/fpn_final.py) — eval/BN/TPU only
    fused_l2: bool = False         # ModelConfig.fused_fpn_l2: level 2 as the
    # same kernel, chaining its intra tensor to the final level in CW form
    # (requires fused_final)

    @nn.compact
    def __call__(self, conv01, conv11, conv21, conv31, training: bool = False):
        ch = self.feat_chs
        final_ch = ch[-1]
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)

        intra = conv31
        out0 = _OutBlock(ch[3], kernel=1, **kw, name="out0")(intra, training)

        # EXPERIMENTAL (default OFF): each top-down level as ONE Pallas
        # kernel (ops/pallas/fpn_up.py). Parity-tested, but measured SLOWER
        # than the XLA chain on v5e (11 ms/level vs ~55 ms for the whole
        # chain -> net regression): the per-step [rows, C, W] -> [C, rows, W]
        # sublane transposes dominate. Kept behind ModelConfig.fused_fpn /
        # MVSTPU_FUSED_FPN=1 for re-evaluation on future compiler versions.
        fused_wanted = (self.use_fused_level if _FUSED_FPN_ENV is None
                        else _FUSED_FPN_ENV == "1")
        use_kernel = (
            fused_wanted
            and not training and self.norm == "BN"
            and not self.is_initializing()
            and conv31.shape[1] % 8 == 0 and conv31.shape[1] >= 24
            and jax.devices()[0].platform == "tpu"
        )
        if use_kernel:
            from mvsformer_tpu.ops.pallas.fpn_up import (
                fpn_up_level, interleave_h, pack_lateral, pack_prev,
                phases_to_prev)

            p = self.variables["params"]
            bs = self.variables["batch_stats"]

            def bn(name):
                bp = p[name]["Norm_0"]["BatchNorm_0"]
                bsn = bs[name]["Norm_0"]["BatchNorm_0"]
                return (bp["scale"], bp["bias"], bsn["mean"], bsn["var"])

            prev = pack_prev(conv31.astype(self.dtype))
            outs = []
            levels = [(conv21, ch[2]), (conv11, ch[1]), (conv01, ch[0])]
            for lvl, (lat, co) in enumerate(levels, start=1):
                out_ph, intra_ph = fpn_up_level(
                    prev, pack_lateral(lat.astype(self.dtype)),
                    p[f"inner{lvl}"]["kernel"], p[f"inner{lvl}"]["bias"],
                    p[f"out{lvl}"]["Conv_0"]["kernel"],
                    p[f"out{lvl}"]["Conv_0"]["bias"],
                    bn(f"out{lvl}"), emit_intra=(lvl < 3))
                outs.append(interleave_h(out_ph))
                if lvl < 3:
                    prev = phases_to_prev(intra_ph)
            return out0, outs[0], outs[1], outs[2]

        def up2(x):
            return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                                   spatial_axes=(1, 2), align_corners=True)

        intra = up2(intra) + MatmulConv1x1(final_ch, dtype=self.dtype, name="inner1")(conv21)
        out1 = _OutBlock(ch[2], **kw, name="out1")(intra, training)

        # Fused-level gating. The fused encoder head hands the final-level
        # lateral over in (phase, c)-rows form [N, H, 16, w] (w >= 128 in
        # the last dim distinguishes it from NHWC's 8 channels); it is only
        # ever produced when the final-level kernel is on to consume it.
        lat_phased = conv01.shape[-1] >= 128
        H_full = conv01.shape[1]
        use_final_kernel = (
            self.fused_final
            and not training and self.norm == "BN"
            and not self.is_initializing()
            and H_full % 8 == 0
            and (lat_phased or conv01.shape[2] % 256 == 0)
            and _on_tpu()
        )
        if lat_phased and not use_final_kernel:
            raise ValueError(
                "phase-form lateral from the fused encoder head requires the "
                "fused final-level kernel (fused_fpn_final)")
        use_l2_kernel = (
            use_final_kernel and self.fused_l2
            and conv11.shape[-1] == ch[1]
            and conv11.shape[1] % 8 == 0 and conv11.shape[2] % 256 == 0
        )

        def _fold(name):
            p = self.variables["params"][name]["Norm_0"]["BatchNorm_0"]
            s = self.variables["batch_stats"][name]["Norm_0"]["BatchNorm_0"]
            inv = jax.lax.rsqrt(s["var"].astype(jnp.float32) + 1e-5)
            mul = p["scale"].astype(jnp.float32) * inv
            add = (p["bias"].astype(jnp.float32)
                   - s["mean"].astype(jnp.float32) * mul)
            return mul, add

        if use_l2_kernel:
            # Level 2 as one kernel, handing its intra tensor to the final
            # level in CW form — the full-res NHWC intra never exists.
            from mvsformer_tpu.ops.pallas.fpn_final import fpn_level

            p = self.variables["params"]
            out2, intra = fpn_level(
                intra, conv11.astype(self.dtype),
                p["inner2"]["kernel"], p["inner2"]["bias"],
                p["out2"]["Conv_0"]["kernel"], p["out2"]["Conv_0"]["bias"],
                _fold("out2"), emit_intra=True)
        else:
            intra = up2(intra) + MatmulConv1x1(final_ch, dtype=self.dtype, name="inner2")(conv11)
            out2 = _OutBlock(ch[1], **kw, name="out2")(intra, training)

        # Final level: its intra tensor is the only one never consumed
        # downstream, so the out3 conv is pushed through the resize and the
        # 1x1 lateral (ops/fpn_collapse.py) — exact, and skips the 64-ch
        # full-res intra entirely. Params are created by the reference path
        # during init; the collapsed path reads them from the scope.
        if use_final_kernel:
            from mvsformer_tpu.ops.pallas.fpn_final import fpn_level

            p = self.variables["params"]
            # Layout firewall (NHWC lateral only): without the barrier, the
            # kernel operand's row-major phase transpose propagates its
            # layout demand up through conv01 into conv00, flipping both
            # full-res encoder convs off the fast conv emitter (measured:
            # conv00 3.2 -> 27 ms/frame as a kLoop fusion; the barrier only
            # recovers a fraction — 4.79 -> 4.85 of 5.67 dm/s). The REAL fix
            # is the fused encoder head (fused_enc_head), which produces the
            # lateral in kernel-native form so no demand ever reaches the
            # encoder convs.
            lat_b = conv01 if lat_phased else jax.lax.optimization_barrier(
                conv01.astype(self.dtype))
            out3 = fpn_level(
                intra, lat_b,
                p["inner3"]["kernel"], p["inner3"]["bias"],
                p["out3"]["Conv_0"]["kernel"], p["out3"]["Conv_0"]["bias"],
                _fold("out3"))
            return out0, out1, out2, out3

        if self.collapse_last and not self.is_initializing():
            p = self.variables["params"]
            # (optimization_barrier on the lateral/pre seams was measured
            # WORSE — 4.35 vs 4.57 dm/s — it blocks the Norm/swish fusion
            # without fixing the conv00 lowering flip; keep the plain form.)
            pre = collapsed_final_level(
                intra, conv01.astype(self.dtype),
                p["inner3"]["kernel"], p["inner3"]["bias"],
                p["out3"]["Conv_0"]["kernel"], p["out3"]["Conv_0"]["bias"])
            out3 = _OutBlock(ch[0], **kw, name="out3")(None, training, pre=pre)
        else:
            intra = up2(intra) + MatmulConv1x1(final_ch, dtype=self.dtype,
                                               name="inner3")(conv01)
            out3 = _OutBlock(ch[0], **kw, name="out3")(intra, training)

        return out0, out1, out2, out3


class FPNDecoderV2(nn.Module):
    """Multi-scale variant fusing ViT pyramid maps by concat (module.py:273-302)."""

    feat_chs: Sequence[int] = (8, 16, 32, 64)
    norm: str = "BN"
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, conv01, conv11, conv21, conv31, vit1, vit2, vit3,
                 training: bool = False):
        ch = self.feat_chs
        kw = dict(norm=self.norm, dtype=self.dtype, axis_name=self.axis_name)

        out1 = _OutBlock(ch[3], **kw, name="out1")(
            jnp.concatenate([conv31, vit1], axis=-1), training)

        up1 = Deconv2dNormAct(ch[2], **kw, act=nn.relu, name="upsample1")(out1, training)
        out2 = _OutBlock(ch[2], **kw, name="out2")(
            jnp.concatenate([up1 + conv21, vit2], axis=-1), training)

        up2 = Deconv2dNormAct(ch[1], **kw, act=nn.relu, name="upsample2")(out2, training)
        out3 = _OutBlock(ch[1], **kw, name="out3")(
            jnp.concatenate([up2 + conv11, vit3], axis=-1), training)

        up3 = Deconv2dNormAct(ch[0], **kw, act=nn.relu, name="upsample3")(out3, training)
        out4 = _OutBlock(ch[0], **kw, name="out4")(up3 + conv01, training)

        return out1, out2, out3, out4
