"""Depth-map evaluation metrics.

Functional spec: /root/reference/utils.py:150-182 — per-image masked
threshold-error rates and absolute depth error, averaged over the batch.
Implemented with mask-weighted means (static shapes, jit-friendly); the
validation monitor `mean_error` is the mean of the 2/4/8/14mm rates
(mvsformer_trainer.py:274-275).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _per_image_masked_mean(x: Array, mask: Array) -> Array:
    """Mean over masked pixels per image, then mean over the batch."""
    mask = mask.astype(x.dtype)
    axes = tuple(range(1, x.ndim))
    per_img = (x * mask).sum(axes) / (mask.sum(axes) + 1e-12)
    return per_img.mean()


def thres_metric(depth_est: Array, depth_gt: Array, mask: Array, thres: float) -> Array:
    """Fraction of masked pixels with |err| > thres (utils.py:162-170)."""
    err = jnp.abs(depth_est - depth_gt)
    return _per_image_masked_mean((err > thres).astype(jnp.float32), mask)


def abs_depth_error(
    depth_est: Array, depth_gt: Array, mask: Array, thres=None
) -> Array:
    """Masked mean |err|, optionally restricted to an error band (utils.py:173-182)."""
    err = jnp.abs(depth_est - depth_gt)
    m = mask.astype(jnp.bool_)
    if thres is not None:
        m = m & (err >= float(thres[0])) & (err <= float(thres[1]))
    return _per_image_masked_mean(err, m)


def depth_metrics(depth_est: Array, depth_gt: Array, mask: Array, di: Array | float):
    """The DTU depth-metric suite (test.py:310-327): abs error + threshold
    rates at {1,2,4,8,14,20}*di mm, di = depth_interval / 2.65."""
    out = {"abs_depth_error": abs_depth_error(depth_est, depth_gt, mask, thres=[0.0, 10.0])}
    for k in (1, 2, 4, 8, 14, 20):
        out[f"thres{k}mm_error"] = thres_metric(depth_est, depth_gt, mask, k * di)
    return out


def validation_metrics(depth_est: Array, depth_gt: Array, mask: Array, di: Array | float):
    """Validation metric dict; `mean_error` gates checkpointing
    (mvsformer_trainer.py:259-275)."""
    m = {
        "abs_error": abs_depth_error(depth_est, depth_gt, mask),
        "thres2mm_error": thres_metric(depth_est, depth_gt, mask, 2 * di),
        "thres4mm_error": thres_metric(depth_est, depth_gt, mask, 4 * di),
        "thres8mm_error": thres_metric(depth_est, depth_gt, mask, 8 * di),
        "thres14mm_error": thres_metric(depth_est, depth_gt, mask, 14 * di),
    }
    m["mean_error"] = (
        m["thres2mm_error"] + m["thres4mm_error"] + m["thres8mm_error"] + m["thres14mm_error"]
    ) / 4.0
    return m
