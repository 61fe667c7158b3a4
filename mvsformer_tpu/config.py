"""Typed experiment configuration.

The reference passes raw dicts read with `.get(key, default)` everywhere
(mvsformer_model.py:30-49); the effective schema is implicit. Here the full
knob surface is a set of dataclasses, JSON-loadable (same section layout as
configs/config_mvsformer.json) and CLI-overridable via dotted paths.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ViTConfig:
    twin: bool = True
    rescale: float = 0.5
    do_vit: bool = True
    patch_size: int = 16
    qk_scale: str | float = "default"
    vit_arch: str = "alt_gvt_small"
    vit_path: str = ""
    vit_ch: Any = field(default_factory=lambda: [64, 128, 256, 512])
    out_ch: int = 64
    att_fusion: bool = True
    nhead: int = 6
    multi_scale_decoder: bool = False
    cross_att: bool = False
    drop_path_rate: float | None = None  # None = architecture preset


@dataclass
class ModelConfig:
    model_type: str = "twin"  # "twin" (MVSFormer) | "dino" (MVSFormer-P)
    fix: bool = False  # freeze backbone
    depth_type: str = "ce"  # ce | re | was | mixup_ce
    mask_out_range: bool = False
    focal: bool = False
    gamma: float = 2.0
    fusion_type: str = "cnn"  # cnn | epipole | epipoleV2
    inverse_depth: bool = True
    attn_temp: float = 2.0
    base_ch: int = 8  # correlation groups G
    model_th: int = 8  # ndepth threshold selecting CostRegNet3D vs CostRegNet
    ndepths: Any = field(default_factory=lambda: [32, 16, 8, 4])
    feat_chs: Any = field(default_factory=lambda: [8, 16, 32, 64])
    depth_interals_ratio: Any = field(default_factory=lambda: [4.0, 2.67, 1.5, 1.0])
    multi_scale: bool = False
    norm_type: str = "BN"  # BN | GN — GN avoids cross-replica stat sync on TPU
    use_fused_warp: bool = True  # Pallas warp+corr kernel on the eval path
    fused_band_rows: int = 12  # y-band height K (>= warp_rows+1+epipolar tilt)
    warp_rows: int = 16  # kernel output rows per grid step (sublane block;
    # ops/pallas/warp_corr.py ROWS). Env: MVSTPU_WARP_ROWS. Round-5: after
    # the union-band cut the v4 kernels are grid-step-overhead-leaning
    # (stage4 runs ~7k steps/frame at rows=8); rows=16 halves the steps:
    # 7.58 -> 7.76 dm/s pipelined (rows=32 within noise, worse serial).
    clamp_eth3d: bool = False  # ETH3D clamped inverse-depth schedulers
    remat_backbone: bool = False  # jax.checkpoint the ViT (train-memory valve)
    eval_view_chunk: int = 0  # >0: eval backbone processes views in chunks of
    # this many (HBM valve at large eval shapes, the TPU analog of the
    # reference's eval-time python view loop, mvsformer_model.py:379-399)
    fused_variant: int = 4  # 1 = row-batched matmul, 2 = transpose-free,
    # 3 = transpose-free + per-row y-windows (KR=4 x-matmuls), 4 = v3 with
    # in-kernel coordinates + invalid mask + streaming entropy (no px/py
    # volume plumbing; epipoleV2 falls back to v3 — it consumes the mask
    # itself). v5e-measured eval at the DTU shape (docs/BENCH_DETAILS.json):
    # XLA 0.69 / v1 1.62 / v2 3.44 / v3 4.32 / v4 5.40 depth-maps/s/chip
    # (v4 pipelined; serial latency 4.20)
    fused_train_warp: bool = True  # fused kernel fwd in the training warp
    # (v5e: 2.48 train-steps/s with the native bwd vs 0.54 all-XLA)
    fused_native_bwd: bool = True  # Pallas backward kernel (exact band
    # adjoint, no XLA gather/scatter); False = XLA-recompute VJP fallback
    fused_bf16_band: bool = False  # bf16 source band + tent weights in the
    # fused kernel (native-MXU bf16 path, fp32 accumulation); validate
    # accuracy on real DTU before enabling in production
    warp_union_extra: int = 16  # >= 0: union-band DMA in the v4/v4_mv warp
    # kernels — ONE (band_rows + this many extra) row band per (row-block,
    # depth-group) instead of one band per depth plane. The in-model DMA wall
    # is per-byte (docs/DESIGN.md), so overlapping per-plane windows (always,
    # for refined-stage hypotheses) make this a up-to-DP*K/KU bytes cut.
    # Planes whose window escapes the union get v4's standard zero-extension
    # clamp. -1 = off. Env: MVSTPU_WARP_UNION. v5e-measured at the DTU eval
    # shape: 5.39 -> 5.67 dm/s pipelined (16 and 32 within noise — the
    # ~3x kernel-byte cut saturates the win, so the smaller clamp wins).
    mv_fused: bool = True  # all-views-in-ONE-pallas-call eval path (v4 + cnn
    # fusion): folds source views into the kernel batch grid dim (16 -> 4
    # warp calls and vis-net calls per frame); numerics identical to the
    # per-view loop. False = per-view kernel loop (A/B + tests).
    # Env: MVSTPU_MV_FUSED.
    corr_bf16: bool = False  # store per-view correlation volumes in bf16 on
    # the fused eval path (f32 in-kernel accumulation, one rounding at the
    # store; view-weighted sum still accumulates f32). Halves the largest
    # eval buffers' HBM traffic; the 3D cost-reg consumes the volume in bf16
    # either way. Env: MVSTPU_CORR_BF16.
    # --- kernel-routing knobs (formerly MVSTPU_* env vars) ---------------
    # Config is the source of truth and is snapshotted with the run; a SET
    # MVSTPU_* env var still overrides the matching field, so
    # `MVSTPU_SMALLCONV=<csv> python bench.py` sweeps keep working without
    # config edits. Override timing differs by knob: FUSED_VIS/FUSED_FPN are
    # read once at import; SMALLCONV/SMALLCONV_S1CAP/WARP_ROWS are re-read at
    # every build_model call (a mid-process env change takes effect there).
    fused_vis: bool = True  # fused VisibilityNet Pallas kernel (BN-norm
    # eval on TPU only; ops/pallas/vis_net.py). Env: MVSTPU_FUSED_VIS.
    fused_fpn: bool = False  # EXPERIMENTAL fused FPN top-down level kernel
    # (measured slower than the XLA chain on v5e). Env: MVSTPU_FUSED_FPN.
    fused_enc_head: bool = True  # conv00 + conv01 + downsample1 as ONE
    # Pallas kernel (ops/pallas/encoder_head.py), emitting the final-level
    # lateral in kernel-native (phase, c) form. Requires fused_fpn_final
    # (build_model enforces the pairing): any Pallas consumer of an
    # XLA-produced conv01 forces default layout on it, and layout
    # assignment then re-lowers conv00/conv01 off the fast conv emitter
    # (measured 3.2 -> 27 ms/frame); producing conv01 IN a kernel whose
    # input is the jit entry parameter is the only clean escape.
    # Env: MVSTPU_ENC_HEAD.
    fused_fpn_final: bool = True  # the FINAL FPN level (up2 + 1x1 lateral +
    # out3 conv + folded BN + swish) as ONE Pallas kernel
    # (ops/pallas/fpn_final.py). The round-5 trace showed this level was the
    # biggest XLA fusion cluster (~22 ms/frame incl. both top layout
    # copies); the kernel runs it in ~2.5 ms/frame. Paired with
    # fused_enc_head (the two defaults flip together): 5.67 -> 7.37 dm/s
    # pipelined on v5e. Env: MVSTPU_FPN_FINAL.
    fused_stage_tail: bool = True  # eval ce/was depth decode (softmax +
    # temperature regression + max-prob confidence) as one Pallas pass over
    # the [B,D,H,W] logit volume (ops/pallas/stage_tail.py). The round-4
    # verdict's prescribed kernel; the round-5 reattribution showed the
    # decode is already well-fused by XLA, so the win is small but real:
    # 7.58 -> 7.65 dm/s pipelined on v5e. Env: MVSTPU_TAIL.
    fused_fpn_l2: bool = True  # FPN level 2 (up2 + inner2 + out2) as the
    # same fused-level kernel, handing its intra tensor to the final level
    # kernel in CW form (the full-res NHWC intra2 never exists). Requires
    # fused_fpn_final. v5e: 7.37 -> 7.58 dm/s pipelined.
    # Env: MVSTPU_FPN_L2.
    fpn_collapse: bool = False  # collapse the FINAL FPN level: push the out3
    # conv through the 2x resize + 1x1 lateral (ops/fpn_collapse.py) — exact,
    # skips the 64-ch full-res intra tensor. v5e status: cuts the decoder
    # scope 40.5 -> 18.3 ms/frame in isolation, but XLA layout assignment
    # retaliates upstream (conv00 stops lowering as a convolution, stage-4
    # feature pads go pathological) for a NET regression 5.41 -> 4.57 dm/s;
    # default OFF until the layout seams are pinned. Env: MVSTPU_FPN_COLLAPSE.
    smallconv_modes: str = "s1,deconv"  # tiny-channel conv classes routed
    # through the matmul+shift-add SmallConv path (ops/smallconv.py):
    # csv of {"s1","strided","deconv"}. Env: MVSTPU_SMALLCONV.
    smallconv_s1cap: int = 144  # taps*features cap for stride-1 routing
    # (beyond it the materialized taps*C z-traffic exceeds the layout win).
    # Env: MVSTPU_SMALLCONV_S1CAP.
    fused_gsa: bool = False  # Twins global-subsampled attention as ONE
    # Pallas pass (ops/pallas/gsa_attention.py): the fp32 [B,nh,N,Nk] logit
    # matrix (477 MB at the DTU stage-0 block, crossed ~3x) and the
    # head-split transposes never exist in HBM. Deterministic passes only
    # (no VJP; under cfg.fix the backbone is stop_gradient'ed so
    # frozen-backbone training routes too). v5e 2026-08-20: parity-exact but
    # LOSES the frame (6.15 -> 5.56 dm/s pipelined, serial neutral) — the
    # in-model Pallas DMA wall (docs/DESIGN.md round-3/4) prices 9 extra
    # small kernel launches above the 1.4 GB traffic they remove, and the
    # calls do not overlap across pipelined frames. Default OFF; kept for
    # future toolchains. Env: MVSTPU_GSA.
    packed_train_costreg: bool = True  # run the TRAIN-mode cost-reg U-Nets
    # depth-packed too (models/costreg.py _packed with real BatchNorm stats
    # computed in packed [B,H,W,D*C] space): the round-5 train trace's top
    # buckets were the tiny-channel NDHWC conv3d forward+backward fusions the
    # eval packing already cured. BN semantics identical to the flax path
    # (parity-tested incl. running stats, SyncBN pmean, and grads).
    # v5e 512x640 5v mb1: 4.14 -> 5.58 train-steps/s (+35%).
    # Env: MVSTPU_PACKED_TRAIN.
    vit_args: ViTConfig = field(default_factory=ViTConfig)


@dataclass
class MultiScaleConfig:
    scales: Any = field(default_factory=lambda: [
        [512, 640], [512, 704], [512, 768],
        [576, 704], [576, 768], [576, 832],
        [640, 832], [640, 896], [640, 960],
        [704, 896], [704, 960], [704, 1024],
        [768, 960], [768, 1024], [768, 1088],
        [832, 1024], [832, 1088], [832, 1152],
        [896, 1152], [896, 1216], [896, 1280],
        [960, 1216], [960, 1280], [960, 1344],
        [1024, 1280],
    ])
    resize_range: Any = field(default_factory=lambda: [1.0, 1.2])
    scale_batch_map: Any = field(default_factory=lambda: {
        "512": 4, "576": 4, "640": 4, "704": 2, "768": 2, "832": 2,
        "896": 1, "960": 1, "1024": 1,
    })


@dataclass
class AugConfig:
    brightness: float = 0.2
    contrast: float = 0.1
    saturation: float = 0.1
    hue: float = 0.05
    min_gamma: float = 0.9
    max_gamma: float = 1.1


@dataclass
class DataConfig:
    type: str = "DTULoader"
    data_set_type: str = "multi_scale"
    datapath: str = ""
    train_data_list: str = ""
    val_data_list: str = ""
    mode: str = "train"
    nviews: int = 5
    num_depths: int = 192
    multi_scale: bool = True
    multi_scale_args: MultiScaleConfig = field(default_factory=MultiScaleConfig)
    interval_scale: float = 1.06
    resize_scale: float = 0.5
    height: int = 512
    width: int = 640
    shuffle: bool = True
    seq_size: int = 7
    batch_size: int = 8
    crop: bool = True
    consist_crop: bool = False
    num_workers: int = 4
    augment: bool = True
    aug_args: AugConfig = field(default_factory=AugConfig)


@dataclass
class OptimizerConfig:
    vit_lr: float = 3.0e-5
    lr: float = 1.0e-3
    weight_decay: float = 0.01
    layer_decay: float = 0.75
    min_lr: float = 0.01  # final LR as a fraction of peak
    warmup_steps: int = 500
    grad_norm: float | None = None


@dataclass
class TrainerConfig:
    epochs: int = 15
    save_dir: str = "saved/"
    save_period: int = 1
    save_every_steps: int = 0  # >0: mid-epoch model_step checkpoints
    # (preemption recovery; resume skips already-trained batches)
    logging_every: int = 100
    early_stop: int = 10
    depth_scale: float = 1.0
    eval_freq: int = 1
    monitor: str = "min mean_error"


@dataclass
class Config:
    name: str = "MVSFormer-TPU"
    n_devices: int = 1
    precision: str = "bf16"  # bf16 | fp32 (fp32 islands are always kept)
    arch: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)


def _build(cls, data):
    if not dataclasses.is_dataclass(cls) or not isinstance(data, dict):
        return data
    kwargs = {}
    names = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in data.items():
        if k not in names:
            continue
        f = names[k]
        sub = f.type if dataclasses.is_dataclass(f.type) else None
        if sub is None and f.default_factory is not dataclasses.MISSING:  # type: ignore
            probe = f.default_factory()  # type: ignore
            if dataclasses.is_dataclass(probe):
                sub = type(probe)
        kwargs[k] = _build(sub, v) if sub else v
    return cls(**kwargs)


def load_config(path: str | None = None, overrides: dict | None = None) -> Config:
    """Load a JSON config and apply dotted-path overrides.

    Accepts both this framework's layout and the reference layout
    (`arch.args`, `data_loader[0].args`, `optimizer.args`, `trainer`).
    """
    raw: dict = {}
    if path:
        with open(path) as f:
            raw = json.load(f)

    # Normalize reference-style configs.
    if "arch" in raw and isinstance(raw["arch"], dict) and "args" in raw["arch"]:
        raw["arch"] = dict(raw["arch"]["args"])
    if "data_loader" in raw:
        dl = raw.pop("data_loader")
        entry = dl[0] if isinstance(dl, list) else dl
        data = dict(entry.get("args", {}))
        data["type"] = entry.get("type", "DTULoader")
        raw["data"] = data
    if "optimizer" in raw and "args" in raw.get("optimizer", {}):
        raw["optimizer"] = dict(raw["optimizer"]["args"])
    if "arch" in raw and isinstance(raw["arch"], dict):
        va = raw["arch"].get("vit_args")
        if va and va.get("twin") is False:
            raw["arch"].setdefault("model_type", "dino")

    cfg = _build(Config, raw)

    for dotted, value in (overrides or {}).items():
        obj = cfg
        parts = dotted.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], value)
    return cfg


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
