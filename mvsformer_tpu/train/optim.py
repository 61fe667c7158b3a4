"""Optimizer construction: AdamW with backbone/cascade LR split, BEiT-style
layer-wise LR decay, and the warmup-cosine schedule.

Functional spec: /root/reference/train.py:78-99 — Twins path: two param groups
(vit params at vit_lr + weight decay, everything else at lr + no decay); DINO
path: per-ViT-block layer decay `layer_decay^(num_layers - i)` with 1D/no-decay
exemptions (models/lr_decay.py) and 10x for cross_blocks; schedule =
linear warmup then cosine to min_lr fraction (utils.py:441-453).

Implemented as one optax chain with per-leaf LR scale and weight-decay masks
computed from the param-tree paths (the functional equivalent of torch param
groups).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                           min_lr_frac: float):
    """lr(step): linear 0->1 over warmup, then min + (1-min)*cos/2 decay."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        prog = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        cos = min_lr_frac + (1.0 - min_lr_frac) * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return fn


def warmup_multistep_schedule(base_lr: float, milestones, gamma: float = 0.1,
                              warmup_factor: float = 1.0 / 3,
                              warmup_iters: int = 500,
                              warmup_method: str = "linear"):
    """Step-decay schedule with warmup (reference utils.py:238-282
    WarmupMultiStepLR; the secondary scheduler surface)."""
    milestones = tuple(sorted(milestones))

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_method == "constant":
            wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        else:
            alpha = step / max(1, warmup_iters)
            wf = jnp.where(step < warmup_iters,
                           warmup_factor * (1 - alpha) + alpha, 1.0)
        decay = jnp.asarray(1.0, jnp.float32)
        for m in milestones:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return base_lr * wf * decay

    return fn


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _vit_layer_id(path_s: str, num_layers: int) -> int:
    """BEiT layer id for DINO ViT params (lr_decay.py:68-83). Paths are this
    framework's: vit/cls_token, vit/pos_embed, vit/patch_embed, vit/block{i}/..."""
    parts = path_s.split("/")
    assert parts[0] == "vit"
    if len(parts) >= 2 and parts[1] in ("cls_token", "pos_embed"):
        return 0
    if len(parts) >= 2 and parts[1].startswith("patch_embed"):
        return 0
    if len(parts) >= 2 and parts[1].startswith("cross_block"):
        return -1
    if len(parts) >= 2 and parts[1].startswith("block"):
        return int(parts[1].replace("block", "")) + 1
    return num_layers


def lr_scale_tree(params, cfg, model_type: str, vit_depth: int = 12):
    """Per-leaf LR multiplier tree (relative to cfg.lr)."""
    vit_ratio = cfg.vit_lr / cfg.lr

    def scale(path, leaf):
        p = _path_str(path)
        if not p.startswith("vit/"):
            return 1.0
        if model_type == "twin":
            return vit_ratio
        num_layers = vit_depth + 1
        lid = _vit_layer_id(p, num_layers)
        if lid == -1:
            return vit_ratio * 10.0
        return vit_ratio * (cfg.layer_decay ** (num_layers - lid))

    return jax.tree_util.tree_map_with_path(scale, params)


def weight_decay_mask(params, model_type: str):
    """True where weight decay applies: vit params only, excluding 1D params
    and pos_embed/cls_token (train.py:85-98, lr_decay.py:29-34)."""

    def mask(path, leaf):
        p = _path_str(path)
        if not p.startswith("vit/"):
            return False
        if leaf.ndim <= 1:
            return False
        if "pos_embed" in p or "cls_token" in p:
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def frozen_mask(params, fix_backbone: bool):
    """True where params are trainable (backbone frozen when fix=True)."""

    def mask(path, leaf):
        if fix_backbone and _path_str(path).startswith("vit/"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(params, opt_cfg, model_type: str, total_steps: int,
                   fix_backbone: bool = False, vit_depth: int = 12):
    """Build the optax AdamW chain mirroring the reference's param groups.

    Returns (optimizer, schedule_fn) — schedule_fn(step) gives the current
    base LR for logging.
    """
    schedule = warmup_cosine_schedule(
        opt_cfg.lr, opt_cfg.warmup_steps, total_steps, opt_cfg.min_lr)
    scales = lr_scale_tree(params, opt_cfg, model_type, vit_depth)
    wd_mask = weight_decay_mask(params, model_type)
    train_mask = frozen_mask(params, fix_backbone)

    chain = [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(opt_cfg.weight_decay, mask=wd_mask),
        optax.scale_by_learning_rate(schedule),  # negates
    ]
    if opt_cfg.grad_norm is not None:
        chain.insert(0, optax.clip_by_global_norm(opt_cfg.grad_norm))

    base = optax.chain(*chain)

    def scale_leaves(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    scaler = optax.GradientTransformation(lambda p: optax.EmptyState(), scale_leaves)
    tx = optax.chain(base, scaler)
    if fix_backbone:
        tx = optax.chain(tx, optax.masked(
            optax.set_to_zero(),
            jax.tree.map(lambda m: not m, train_mask)))
    return tx, schedule
