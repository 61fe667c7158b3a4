"""Depth decoding from probability volumes.

Functional spec: /root/reference/models/module.py:597-619 (soft-argmax depth
regression and windowed confidence) and mvsformer_model.py:113-146 (the
depth_type dispatch: ce/was argmax-in-train vs temperature regression in eval,
mixup two-bin decode, plain regression + windowed confidence).

Volumes are [B, D, H, W] here (depth axis = 1, same as the reference) — the
depth axis is small (4..32) so layout games buy nothing; XLA keeps the softmax
and the weighted reductions fused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def depth_regression(prob: Array, depth_values: Array) -> Array:
    """Soft-argmax expected depth. prob [B,D,H,W], depths [B,D] or [B,D,H,W]."""
    if depth_values.ndim == 2:
        depth_values = depth_values[:, :, None, None]
    return (prob * depth_values).sum(axis=1)


def select_bin(vol: Array, idx: Array) -> Array:
    """Per-pixel depth-bin selection WITHOUT a gather.

    vol [B, D, H, W] (or a [B, D] per-batch table), idx [B, H, W] int ->
    [B, H, W]. Computed as a one-hot multiply-reduce over the small depth
    axis: XLA fuses the iota comparison into the producer chain (one pass
    over the volume, no gather op; the backward is a broadcast-multiply
    instead of a scatter). TPU gathers are element-rate-bound (~160M
    taps/s, docs/DESIGN.md) — the round-5 train trace showed ~5 ms/step in
    the CE-loss take_along_axis alone. Exact for any idx in [0, D).
    """
    ndepth = vol.shape[1]
    if vol.ndim == 2:
        vol = vol[:, :, None, None]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, ndepth, 1, 1), 1)
    onehot = (iota == idx[:, None]).astype(vol.dtype)
    return (vol * onehot).sum(axis=1)


def conf_regression(prob: Array, n: int = 4) -> Array:
    """Summed probability in an n-bin window centred at the regressed index.

    Spec: module.py:606-619 (avg_pool trick == windowed sum; asymmetric pad for
    even n; index from soft-argmax over bin indices, clamped).
    """
    prob = jax.lax.stop_gradient(prob)
    B, D, H, W = prob.shape
    if n % 2 == 1:
        pad_lo, pad_hi = n // 2, n // 2
    else:
        pad_lo, pad_hi = n // 2 - 1, n // 2
    padded = jnp.pad(prob, ((0, 0), (pad_lo, pad_hi), (0, 0), (0, 0)))
    # windowed sum over depth via cumulative sum: sum_{k..k+n-1}
    csum = jnp.concatenate(
        [jnp.zeros_like(padded[:, :1]), jnp.cumsum(padded, axis=1)], axis=1
    )
    win = csum[:, n:] - csum[:, :-n]  # [B, D, H, W]
    idx_f = depth_regression(prob, jnp.broadcast_to(jnp.arange(D, dtype=prob.dtype)[None], (B, D)))
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, D - 1)
    return select_bin(win, idx)


def argmax_depth(prob: Array, depth_values: Array) -> Array:
    """Vanilla argmax decode used in ce/was training (mvsformer_model.py:117-120)."""
    idx = jnp.argmax(prob, axis=1)
    return select_bin(depth_values, idx)


def temperature_regression(logits: Array, depth_values: Array, tmp: float) -> Array:
    """Eval-time temperature-sharpened soft-argmax (mvsformer_model.py:121-123)."""
    return depth_regression(jax.nn.softmax(logits * tmp, axis=1), depth_values)


def mixup_depth(prob: Array, depth_values: Array):
    """Two-bin mixup decode (mvsformer_model.py:126-136).

    Returns (depth [B,H,W], confidence [B,H,W]).
    """
    prob_l = prob[:, :-1]
    prob_r = prob[:, 1:]
    mix = prob_l + prob_r
    conf = mix.max(axis=1)
    idx = mix.argmax(axis=1)
    denom = prob_l + prob_r + 1e-7
    wl = prob_l / denom
    wr = prob_r / denom
    if depth_values.ndim == 2:
        depth_values = depth_values[:, :, None, None]
    mix_depth = depth_values[:, :-1] * wl + depth_values[:, 1:] * wr
    depth = select_bin(mix_depth, idx)
    return depth, conf


def decode_depth(
    logits: Array,
    prob: Array,
    depth_values: Array,
    depth_type: str,
    ndepth: int,
    training: bool,
    tmp: float,
):
    """Full depth_type dispatch -> (depth, photometric_confidence).

    Spec: mvsformer_model.py:113-146. `logits` is the pre-softmax volume
    (prob_volume_pre), `prob` its softmax; both [B, D, H, W] fp32.
    """
    if depth_type in ("ce", "was"):
        if training:
            depth = argmax_depth(prob, depth_values)
        else:
            depth = temperature_regression(logits, depth_values, tmp)
        conf = prob.max(axis=1)
    elif depth_type == "mixup_ce":
        depth, conf = mixup_depth(prob, depth_values)
    else:  # plain regression ("re")
        depth = depth_regression(prob, depth_values)
        if ndepth >= 32:
            conf = conf_regression(prob, n=4)
        elif ndepth == 16:
            conf = conf_regression(prob, n=3)
        elif ndepth == 8:
            conf = conf_regression(prob, n=2)
        else:
            conf = prob.max(axis=1)
    return depth, jax.lax.stop_gradient(conf)
