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

Also converts full reference MVSFormer checkpoints' `vit.` subtree so users
can port their trained backbones; cascade-head weights are architecture-new
here (NHWC convs, different norm bootstrapping) and are NOT converted.
"""

from __future__ import annotations

import numpy as np


def _t(w):  # torch Linear -> flax Dense kernel
    return np.asarray(w).T


def _conv(w):  # torch conv -> flax conv kernel
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _set(tree, path, value):
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
        _set(out, f"patch_embed{i}/proj/kernel", _conv(sd[f"patch_embeds.{i}.proj.weight"]))
        _set(out, f"patch_embed{i}/proj/bias", sd[f"patch_embeds.{i}.proj.bias"])
        _set(out, f"patch_embed{i}/norm/scale", sd[f"patch_embeds.{i}.norm.weight"])
        _set(out, f"patch_embed{i}/norm/bias", sd[f"patch_embeds.{i}.norm.bias"])

        # PosCNN: depthwise conv (gvt.py:360-378)
        w = sd[f"pos_block.{i}.proj.0.weight"]
        _set(out, f"pos_block{i}/proj/kernel", np.transpose(w, (2, 3, 1, 0)))
        _set(out, f"pos_block{i}/proj/bias", sd[f"pos_block.{i}.proj.0.bias"])

        if f"norm_list.{i}.weight" in sd:
            _set(out, f"stage_norm{i}/scale", sd[f"norm_list.{i}.weight"])
            _set(out, f"stage_norm{i}/bias", sd[f"norm_list.{i}.bias"])

        for j in range(depths[i]):
            p = f"blocks.{i}.{j}"
            q = f"block{i}_{j}"
            _set(out, f"{q}/norm1/scale", sd[f"{p}.norm1.weight"])
            _set(out, f"{q}/norm1/bias", sd[f"{p}.norm1.bias"])
            _set(out, f"{q}/norm2/scale", sd[f"{p}.norm2.weight"])
            _set(out, f"{q}/norm2/bias", sd[f"{p}.norm2.bias"])
            _set(out, f"{q}/mlp/fc1/kernel", _t(sd[f"{p}.mlp.fc1.weight"]))
            _set(out, f"{q}/mlp/fc1/bias", sd[f"{p}.mlp.fc1.bias"])
            _set(out, f"{q}/mlp/fc2/kernel", _t(sd[f"{p}.mlp.fc2.weight"]))
            _set(out, f"{q}/mlp/fc2/bias", sd[f"{p}.mlp.fc2.bias"])

            if f"{p}.attn.qkv.weight" in sd:  # windowed GroupAttention
                _set(out, f"{q}/attn/qkv/kernel", _t(sd[f"{p}.attn.qkv.weight"]))
                _set(out, f"{q}/attn/qkv/bias", sd[f"{p}.attn.qkv.bias"])
            else:  # global subsampled attention
                _set(out, f"{q}/attn/q/kernel", _t(sd[f"{p}.attn.q.weight"]))
                _set(out, f"{q}/attn/q/bias", sd[f"{p}.attn.q.bias"])
                _set(out, f"{q}/attn/kv/kernel", _t(sd[f"{p}.attn.kv.weight"]))
                _set(out, f"{q}/attn/kv/bias", sd[f"{p}.attn.kv.bias"])
                if f"{p}.attn.sr.weight" in sd:
                    _set(out, f"{q}/attn/sr/kernel", _conv(sd[f"{p}.attn.sr.weight"]))
                    _set(out, f"{q}/attn/sr/bias", sd[f"{p}.attn.sr.bias"])
                    _set(out, f"{q}/attn/norm/scale", sd[f"{p}.attn.norm.weight"])
                    _set(out, f"{q}/attn/norm/bias", sd[f"{p}.attn.norm.bias"])
            _set(out, f"{q}/attn/proj/kernel", _t(sd[f"{p}.attn.proj.weight"]))
            _set(out, f"{q}/attn/proj/bias", sd[f"{p}.attn.proj.bias"])
    return out


def convert_dino_vit(state_dict: dict, depth=12) -> dict:
    """torch DINO ViT state_dict -> flax DINOViT param tree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: dict = {}
    _set(out, "cls_token", sd["cls_token"])
    _set(out, "pos_embed", sd["pos_embed"])
    _set(out, "patch_embed/kernel", _conv(sd["patch_embed.proj.weight"]))
    _set(out, "patch_embed/bias", sd["patch_embed.proj.bias"])
    _set(out, "norm/scale", sd["norm.weight"])
    _set(out, "norm/bias", sd["norm.bias"])
    for i in range(depth):
        p = f"blocks.{i}"
        q = f"block{i}"
        _set(out, f"{q}/norm1/scale", sd[f"{p}.norm1.weight"])
        _set(out, f"{q}/norm1/bias", sd[f"{p}.norm1.bias"])
        _set(out, f"{q}/norm2/scale", sd[f"{p}.norm2.weight"])
        _set(out, f"{q}/norm2/bias", sd[f"{p}.norm2.bias"])
        _set(out, f"{q}/attn/qkv/kernel", _t(sd[f"{p}.attn.qkv.weight"]))
        _set(out, f"{q}/attn/qkv/bias", sd[f"{p}.attn.qkv.bias"])
        _set(out, f"{q}/attn/proj/kernel", _t(sd[f"{p}.attn.proj.weight"]))
        _set(out, f"{q}/attn/proj/bias", sd[f"{p}.attn.proj.bias"])
        _set(out, f"{q}/fc1/kernel", _t(sd[f"{p}.mlp.fc1.weight"]))
        _set(out, f"{q}/fc1/bias", sd[f"{p}.mlp.fc1.bias"])
        _set(out, f"{q}/fc2/kernel", _t(sd[f"{p}.mlp.fc2.weight"]))
        _set(out, f"{q}/fc2/bias", sd[f"{p}.mlp.fc2.bias"])
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
