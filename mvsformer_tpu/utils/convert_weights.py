"""One-time torch checkpoint -> flax param-tree converter for the pretrained
backbones (Twins alt_gvt_* and DINO ViT).

The reference loads torch-format pretrained weights non-strictly
(mvsformer_model.py:182-193, 335-340; utils.py:363-390 torch_init_model).
Here the torch state_dict (read via `torch.load` or a numpy .npz re-dump) is
re-laid-out into this framework's pytree:

- torch Conv2d [O, I, kh, kw]     -> flax kernel [kh, kw, I, O]
- torch depthwise Conv2d [C,1,k,k] -> flax kernel [k, k, 1, C]
- torch Linear [O, I]             -> flax kernel [I, O]
- torch LayerNorm weight          -> flax scale
- qkv packing: torch qkv.weight rows are [q; k; v] (timm/DINO convention);
  flax qkv kernel columns follow the same order after transpose.

Full reference checkpoints convert too: `convert_full_twin` /
`convert_full_dino` / `load_reference_checkpoint` map EVERY tensor (FPN
encoder/decoder, decoders, StageNet vis CNNs, cost-reg U-Nets, backbone, BN
running stats) so trained reference MVSFormer checkpoints run in this
framework — parity is pinned per-stage by tests/test_reference_parity.py.
"""

from __future__ import annotations

import numpy as np


def _t(w):  # torch Linear -> flax Dense kernel
    return None if w is None else np.asarray(w).T


def _conv(w):  # torch conv -> flax conv kernel
    return None if w is None else np.transpose(np.asarray(w), (2, 3, 1, 0))


def _set(tree, path, value):
    if value is None:  # missing source key: non-strict load skips it
        return
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def convert_twins(state_dict: dict, depths=(2, 2, 10, 4)) -> dict:
    """torch alt_gvt_* state_dict -> flax ALTGVT param tree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: dict = {}

    for i in range(len(depths)):
        _set(out, f"patch_embed{i}/proj/kernel", _conv(sd.get(f"patch_embeds.{i}.proj.weight")))
        _set(out, f"patch_embed{i}/proj/bias", sd.get(f"patch_embeds.{i}.proj.bias"))
        _set(out, f"patch_embed{i}/norm/scale", sd.get(f"patch_embeds.{i}.norm.weight"))
        _set(out, f"patch_embed{i}/norm/bias", sd.get(f"patch_embeds.{i}.norm.bias"))

        # PosCNN: depthwise conv (gvt.py:360-378)
        w = sd.get(f"pos_block.{i}.proj.0.weight")
        _set(out, f"pos_block{i}/proj/kernel",
             None if w is None else np.transpose(w, (2, 3, 1, 0)))
        _set(out, f"pos_block{i}/proj/bias", sd.get(f"pos_block.{i}.proj.0.bias"))

        if f"norm_list.{i}.weight" in sd:
            _set(out, f"stage_norm{i}/scale", sd.get(f"norm_list.{i}.weight"))
            _set(out, f"stage_norm{i}/bias", sd.get(f"norm_list.{i}.bias"))

        for j in range(depths[i]):
            p = f"blocks.{i}.{j}"
            q = f"block{i}_{j}"
            _set(out, f"{q}/norm1/scale", sd.get(f"{p}.norm1.weight"))
            _set(out, f"{q}/norm1/bias", sd.get(f"{p}.norm1.bias"))
            _set(out, f"{q}/norm2/scale", sd.get(f"{p}.norm2.weight"))
            _set(out, f"{q}/norm2/bias", sd.get(f"{p}.norm2.bias"))
            _set(out, f"{q}/mlp/fc1/kernel", _t(sd.get(f"{p}.mlp.fc1.weight")))
            _set(out, f"{q}/mlp/fc1/bias", sd.get(f"{p}.mlp.fc1.bias"))
            _set(out, f"{q}/mlp/fc2/kernel", _t(sd.get(f"{p}.mlp.fc2.weight")))
            _set(out, f"{q}/mlp/fc2/bias", sd.get(f"{p}.mlp.fc2.bias"))

            if f"{p}.attn.qkv.weight" in sd:  # windowed GroupAttention
                _set(out, f"{q}/attn/qkv/kernel", _t(sd.get(f"{p}.attn.qkv.weight")))
                _set(out, f"{q}/attn/qkv/bias", sd.get(f"{p}.attn.qkv.bias"))
            else:  # global subsampled attention
                _set(out, f"{q}/attn/q/kernel", _t(sd.get(f"{p}.attn.q.weight")))
                _set(out, f"{q}/attn/q/bias", sd.get(f"{p}.attn.q.bias"))
                _set(out, f"{q}/attn/kv/kernel", _t(sd.get(f"{p}.attn.kv.weight")))
                _set(out, f"{q}/attn/kv/bias", sd.get(f"{p}.attn.kv.bias"))
                if f"{p}.attn.sr.weight" in sd:
                    _set(out, f"{q}/attn/sr/kernel", _conv(sd.get(f"{p}.attn.sr.weight")))
                    _set(out, f"{q}/attn/sr/bias", sd.get(f"{p}.attn.sr.bias"))
                    _set(out, f"{q}/attn/norm/scale", sd.get(f"{p}.attn.norm.weight"))
                    _set(out, f"{q}/attn/norm/bias", sd.get(f"{p}.attn.norm.bias"))
            _set(out, f"{q}/attn/proj/kernel", _t(sd.get(f"{p}.attn.proj.weight")))
            _set(out, f"{q}/attn/proj/bias", sd.get(f"{p}.attn.proj.bias"))
    return out


def convert_dino_vit(state_dict: dict, depth=12) -> dict:
    """torch DINO ViT state_dict -> flax DINOViT param tree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: dict = {}
    _set(out, "cls_token", sd.get("cls_token"))
    _set(out, "pos_embed", sd.get("pos_embed"))
    _set(out, "patch_embed/kernel", _conv(sd.get("patch_embed.proj.weight")))
    _set(out, "patch_embed/bias", sd.get("patch_embed.proj.bias"))
    _set(out, "norm/scale", sd.get("norm.weight"))
    _set(out, "norm/bias", sd.get("norm.bias"))
    for i in range(depth):
        p = f"blocks.{i}"
        q = f"block{i}"
        _set(out, f"{q}/norm1/scale", sd.get(f"{p}.norm1.weight"))
        _set(out, f"{q}/norm1/bias", sd.get(f"{p}.norm1.bias"))
        _set(out, f"{q}/norm2/scale", sd.get(f"{p}.norm2.weight"))
        _set(out, f"{q}/norm2/bias", sd.get(f"{p}.norm2.bias"))
        _set(out, f"{q}/attn/qkv/kernel", _t(sd.get(f"{p}.attn.qkv.weight")))
        _set(out, f"{q}/attn/qkv/bias", sd.get(f"{p}.attn.qkv.bias"))
        _set(out, f"{q}/attn/proj/kernel", _t(sd.get(f"{p}.attn.proj.weight")))
        _set(out, f"{q}/attn/proj/bias", sd.get(f"{p}.attn.proj.bias"))
        _set(out, f"{q}/fc1/kernel", _t(sd.get(f"{p}.mlp.fc1.weight")))
        _set(out, f"{q}/fc1/bias", sd.get(f"{p}.mlp.fc1.bias"))
        _set(out, f"{q}/fc2/kernel", _t(sd.get(f"{p}.mlp.fc2.weight")))
        _set(out, f"{q}/fc2/bias", sd.get(f"{p}.mlp.fc2.bias"))
    return out


def load_torch_state_dict(path: str) -> dict:
    """Load a torch checkpoint into a plain numpy dict (CPU torch required).

    Handles the reference's wrapper formats: raw state_dict, {'model': sd},
    {'state_dict': sd} with optional 'vit.' prefix (mvsformer_model.py:185-191).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
        if any(k.startswith("vit.") for k in sd):
            sd = {k[len("vit."):]: v for k, v in sd.items() if k.startswith("vit.")}
    elif isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        sd = obj["model"]
    else:
        sd = obj
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def load_pretrained_backbone(path: str, arch: str) -> dict:
    """Load + convert a pretrained backbone checkpoint for `arch`."""
    sd = load_torch_state_dict(path)
    if arch.startswith("alt_gvt"):
        depths = {"alt_gvt_small": (2, 2, 10, 4), "alt_gvt_base": (2, 2, 18, 2),
                  "alt_gvt_large": (2, 2, 18, 2)}[arch]
        return convert_twins(sd, depths)
    if arch.startswith("vit"):
        return convert_dino_vit(sd)
    raise ValueError(arch)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + k + "/"))
        else:
            out[prefix + k] = v
    return out


def merge_pretrained_backbone(params: dict, path: str, arch: str,
                              subtree: str = "vit", log=print) -> dict:
    """Merge a converted torch backbone checkpoint into `params[subtree]`.

    Non-strict, like the reference's torch_init_model (utils.py:363-390,
    invoked at model construction, mvsformer_model.py:335-340): keys present
    in both with matching shapes are overwritten from the checkpoint; missing
    and unexpected keys are reported via `log`. Returns a NEW params tree
    (flax param pytrees are treated as immutable)."""
    conv_tree = load_pretrained_backbone(path, arch)
    converted = _flatten(conv_tree)
    if subtree not in params:
        raise KeyError(f"params has no '{subtree}' subtree; keys={list(params)}")
    want = _flatten(params[subtree])

    missing = sorted(set(want) - set(converted))
    unexpected = sorted(set(converted) - set(want))
    mismatched = sorted(
        k for k in set(want) & set(converted)
        if tuple(np.shape(want[k])) != tuple(np.shape(converted[k])))
    loaded = sorted((set(want) & set(converted)) - set(mismatched))
    log(f"[pretrained] {path} -> params/{subtree}: loaded {len(loaded)}/"
        f"{len(want)} tensors; missing {len(missing)}, unexpected "
        f"{len(unexpected)}, shape-mismatch {len(mismatched)}")
    for name, keys in (("missing", missing), ("unexpected", unexpected),
                       ("shape-mismatch", mismatched)):
        for k in keys[:20]:
            log(f"[pretrained]   {name}: {k}")
        if len(keys) > 20:
            log(f"[pretrained]   ... and {len(keys) - 20} more {name}")

    def _merge(dst, src):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = _merge(v, src.get(k, {})) if isinstance(src.get(k), dict) \
                    else dict(v)
            elif k in src and tuple(np.shape(v)) == tuple(np.shape(src[k])):
                out[k] = np.asarray(src[k], dtype=np.asarray(v).dtype)
            else:
                out[k] = v
        return out

    new_params = dict(params)
    new_params[subtree] = _merge(params[subtree], conv_tree)
    return new_params


# ---------------------------------------------------------------------------
# Full-model conversion (cascade heads + backbone): enables loading reference
# MVSFormer checkpoints (models/mvsformer_model.py TwinMVSNet) into this
# framework for inference/finetuning without retraining. The conv blocks here
# use torch-aligned explicit padding (models/blocks.py _torch_pad), so the
# conversion is numerically exact up to float accumulation order.
# ---------------------------------------------------------------------------


def _deconv(w):
    """torch ConvTranspose{2,3}d weight [in, out, k...] -> flax ConvTranspose
    kernel (k..., in, out), spatially flipped (lax.conv_transpose does not
    flip; torch's transposed conv corresponds to the flipped kernel)."""
    if w is None:
        return None
    w = np.asarray(w)
    nd = w.ndim - 2
    w = np.moveaxis(w, (0, 1), (nd, nd + 1))
    return w[(slice(None, None, -1),) * nd].copy()


class _TreePair:
    """Accumulates a (params, batch_stats) pair of nested dicts."""

    def __init__(self):
        self.params: dict = {}
        self.stats: dict = {}


def _conv_block(out, sd, src, dst, conv_transform=_conv, conv_key="conv",
                bn_key="bn", want_bias=False):
    """torch Conv{2,3}d+BN wrapper -> flax <dst>/Conv_0 + Norm_0/BatchNorm_0."""
    layer = "ConvTranspose_0" if conv_transform is _deconv else "Conv_0"
    _set(out.params, f"{dst}/{layer}/kernel",
         conv_transform(sd.get(f"{src}.{conv_key}.weight")))
    bias = sd.get(f"{src}.{conv_key}.bias")
    if bias is not None and want_bias:
        _set(out.params, f"{dst}/{layer}/bias", bias)
    bn = f"{src}.{bn_key}"
    if f"{bn}.weight" in sd:
        _set(out.params, f"{dst}/Norm_0/BatchNorm_0/scale", sd.get(f"{bn}.weight"))
        _set(out.params, f"{dst}/Norm_0/BatchNorm_0/bias", sd.get(f"{bn}.bias"))
        mean = np.asarray(sd.get(f"{bn}.running_mean"))
        if bias is not None and not want_bias:
            # conv bias immediately before BN is absorbed by normalization;
            # shift the running mean so eval-mode outputs are identical.
            mean = mean - np.asarray(bias)
        _set(out.stats, f"{dst}/Norm_0/BatchNorm_0/mean", mean)
        _set(out.stats, f"{dst}/Norm_0/BatchNorm_0/var", sd.get(f"{bn}.running_var"))


def _plain_conv(out, sd, src, dst, transform=_conv):
    _set(out.params, f"{dst}/kernel", transform(sd.get(f"{src}.weight")))
    if f"{src}.bias" in sd:
        _set(out.params, f"{dst}/bias", sd.get(f"{src}.bias"))


def _cost_reg(out, sd, src, dst, three_d_variant: bool):
    """CostRegNet (module.py:469-505) / CostRegNet3D (module.py:550-594)."""
    for n in (1, 2, 3, 4, 5, 6):
        _conv_block(out, sd, f"{src}.conv{n}", f"{dst}/conv{n}",
                    conv_transform=_conv3d)
    for n in (7, 9, 11):
        if three_d_variant:
            # Sequential(ConvTranspose3d, BN, ReLU): keys conv{n}.0 / conv{n}.1
            _conv_block(out, sd, f"{src}.conv{n}", f"{dst}/conv{n}",
                        conv_transform=_deconv, conv_key="0", bn_key="1")
        else:
            _conv_block(out, sd, f"{src}.conv{n}", f"{dst}/conv{n}",
                        conv_transform=_deconv)
    if f"{src}.inner.weight" in sd:
        _plain_conv(out, sd, f"{src}.inner", f"{dst}/inner", _conv3d)
    _plain_conv(out, sd, f"{src}.prob", f"{dst}/prob", _conv3d)


def _conv3d(w):
    if w is None:
        return None
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def convert_full_twin(state_dict: dict, ndepths=(32, 16, 8, 4), model_th=8,
                      vit_depths=(2, 2, 10, 4)):
    """Full reference TwinMVSNet state_dict -> (params, batch_stats) trees.

    Covers: FPN encoder/decoder (mvsformer_model.py:320-324), Twins backbone
    (vit.*, via convert_twins), TwinDecoderStage4 (module.py:389-413), and the
    4 StageNets' vis CNNs + cost-regularization U-Nets
    (mvsformer_model.py:26-160).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out = _TreePair()

    # FPN encoder: Conv2d wrapper blocks (conv + BN, no conv bias).
    for name in ("conv00", "conv01", "downsample1", "conv10", "conv11",
                 "downsample2", "conv20", "conv21", "downsample3",
                 "conv30", "conv31"):
        _conv_block(out, sd, f"encoder.{name}", f"encoder/{name}")

    if "decoder.upsample1.0.weight" in sd:
        # Multi-scale FPNDecoderV2 (module.py:273-302): out1..4 conv blocks +
        # upsample1..3 deconv blocks.
        for k in (1, 2, 3, 4):
            _conv_block(out, sd, f"decoder.out{k}", f"decoder/out{k}",
                        conv_key="0", bn_key="1", want_bias=True)
        for k in (1, 2, 3):
            _conv_block(out, sd, f"decoder.upsample{k}", f"decoder/upsample{k}",
                        conv_transform=_deconv, conv_key="0", bn_key="1")
    else:
        # FPNDecoder: outK = Sequential(conv(bias), BN, Swish); innerK plain.
        for k in range(4):
            _conv_block(out, sd, f"decoder.out{k}", f"decoder/out{k}",
                        conv_key="0", bn_key="1", want_bias=True)
        for k in (1, 2, 3):
            _plain_conv(out, sd, f"decoder.inner{k}", f"decoder/inner{k}")

    # Twin decoder (module.py:389-447): upsampler0 = Sequential(deconv, BN,
    # GELU); innerK plain 1x1; smoothK = Sequential(conv, BN, GELU); the V2
    # (multi-scale) variant adds decoder1/decoder2 deconv blocks.
    if "decoder_vit.upsampler0.0.weight" in sd:
        _conv_block(out, sd, "decoder_vit.upsampler0", "decoder_vit/upsampler0",
                    conv_transform=_deconv, conv_key="0", bn_key="1")
        for k in (1, 2, 3):
            _plain_conv(out, sd, f"decoder_vit.inner{k}", f"decoder_vit/inner{k}")
            _conv_block(out, sd, f"decoder_vit.smooth{k}", f"decoder_vit/smooth{k}",
                        conv_key="0", bn_key="1", want_bias=True)
        for k in (1, 2):
            if f"decoder_vit.decoder{k}.0.weight" in sd:
                _conv_block(out, sd, f"decoder_vit.decoder{k}",
                            f"decoder_vit/decoder{k}", conv_transform=_deconv,
                            conv_key="0", bn_key="1")

    # Stage nets.
    for i, nd in enumerate(ndepths):
        src = f"fusions.{i}"
        dst = f"stage{i + 1}"
        for j in (0, 1, 2):
            _conv_block(out, sd, f"{src}.vis.{j}", f"{dst}/vis/conv{j}")
        _plain_conv(out, sd, f"{src}.vis.3", f"{dst}/vis/conv3")
        _cost_reg(out, sd, f"{src}.cost_reg", f"{dst}/cost_reg",
                  three_d_variant=nd <= model_th)

    # Backbone.
    vit_sd = {k[len("vit."):]: v for k, v in sd.items() if k.startswith("vit.")}
    if vit_sd:
        out.params["vit"] = convert_twins(vit_sd, vit_depths)

    return out.params, out.stats


def load_reference_checkpoint(path: str, ndepths=(32, 16, 8, 4), model_th=8,
                              vit_depths=(2, 2, 10, 4)):
    """Load a full reference MVSFormer checkpoint (torch .pth with
    {'state_dict': ...} or raw) -> (params, batch_stats)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = {k.removeprefix("module."): (v.detach().numpy() if hasattr(v, "detach")
                                      else np.asarray(v))
          for k, v in sd.items()}
    if "decoder_vit.attn.conv_l.0.weight" in sd:  # DINOMVSNet layout
        return convert_full_dino(sd, ndepths, model_th)
    return convert_full_twin(sd, ndepths, model_th, vit_depths)


def convert_full_dino(state_dict: dict, ndepths=(32, 16, 8, 4), model_th=8,
                      vit_depth=12):
    """Full reference DINOMVSNet state_dict -> (params, batch_stats)
    (mvsformer_model.py:163-308 with VITDecoderStage4Single,
    module.py:353-368, and AttentionFusionSimple, module.py:450-466)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out = _TreePair()

    for name in ("conv00", "conv01", "downsample1", "conv10", "conv11",
                 "downsample2", "conv20", "conv21", "downsample3",
                 "conv30", "conv31"):
        _conv_block(out, sd, f"encoder.{name}", f"encoder/{name}")
    for k in range(4):
        _conv_block(out, sd, f"decoder.out{k}", f"decoder/out{k}",
                    conv_key="0", bn_key="1", want_bias=True)
    for k in (1, 2, 3):
        _plain_conv(out, sd, f"decoder.inner{k}", f"decoder/inner{k}")

    # AttentionFusionSimple + 2-deconv decoder.
    _conv_block(out, sd, "decoder_vit.attn.conv_l", "decoder_vit/attn/conv_l",
                conv_key="0", bn_key="1", want_bias=True)
    _conv_block(out, sd, "decoder_vit.attn.conv_r", "decoder_vit/attn/conv_r",
                conv_key="0", bn_key="1", want_bias=True)
    _plain_conv(out, sd, "decoder_vit.attn.proj", "decoder_vit/attn/proj")
    _conv_block(out, sd, "decoder_vit.decoder", "decoder_vit/deconv1",
                conv_transform=_deconv, conv_key="0", bn_key="1")
    _conv_block(out, sd, "decoder_vit.decoder", "decoder_vit/deconv2",
                conv_transform=_deconv, conv_key="3", bn_key="4")

    for i, nd in enumerate(ndepths):
        src = f"fusions.{i}"
        dst = f"stage{i + 1}"
        for j in (0, 1, 2):
            _conv_block(out, sd, f"{src}.vis.{j}", f"{dst}/vis/conv{j}")
        _plain_conv(out, sd, f"{src}.vis.3", f"{dst}/vis/conv3")
        _cost_reg(out, sd, f"{src}.cost_reg", f"{dst}/cost_reg",
                  three_d_variant=nd <= model_th)

    vit_sd = {k[len("vit."):]: v for k, v in sd.items() if k.startswith("vit.")}
    if vit_sd:
        out.params["vit"] = convert_dino_vit(vit_sd, vit_depth)
    return out.params, out.stats
