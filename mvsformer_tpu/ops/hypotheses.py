"""Depth-hypothesis initialization and cascade scheduling.

Functional spec: /root/reference/models/module.py:622-699 (init_range,
init_inverse_range, schedule_range, schedule_inverse_range and their eth3d
clamped variants). All functions are pure, shape-static and differentiable
where the reference is; the cascade passes stop-gradient depth in, matching
`outputs_stage['depth'].detach()` at mvsformer_model.py:290.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvsformer_tpu.ops.resize import resize_bilinear

Array = jax.Array


def init_range(cur_depth: Array, ndepths: int, height: int, width: int) -> Array:
    """Uniform metric-depth hypotheses [B, D, H, W] from a [B, Dfull] range."""
    dmin = cur_depth[:, 0]
    dmax = cur_depth[:, -1]
    itv = (dmax - dmin) / (ndepths - 1)
    steps = jnp.arange(ndepths, dtype=cur_depth.dtype)
    samples = dmin[:, None] + steps[None, :] * itv[:, None]  # [B, D]
    return jnp.broadcast_to(
        samples[:, :, None, None], (cur_depth.shape[0], ndepths, height, width)
    )


def init_inverse_range(cur_depth: Array, ndepths: int, height: int, width: int) -> Array:
    """Uniform inverse-depth hypotheses [B, D, H, W].

    Note the reference's ordering: bin 0 sits at 1/d_max (far-to-near in
    inverse space => depths come out descending), module.py:633-639.
    """
    inv_min = 1.0 / cur_depth[:, 0]
    inv_max = 1.0 / cur_depth[:, -1]
    itv = jnp.arange(ndepths, dtype=cur_depth.dtype) / (ndepths - 1)  # [D]
    inv_hypo = inv_max[:, None] + (inv_min - inv_max)[:, None] * itv[None, :]
    hypo = 1.0 / inv_hypo
    return jnp.broadcast_to(
        hypo[:, :, None, None], (cur_depth.shape[0], ndepths, height, width)
    )


def schedule_inverse_range(
    depth: Array, depth_hypo: Array, ndepths: int, split_itv: float,
    height: int, width: int,
) -> Array:
    """Per-pixel inverse-depth window around the previous stage's depth.

    Args:
      depth: [B, h, w] previous-stage depth (caller stops gradient).
      depth_hypo: [B, Dprev, h, w] previous-stage hypotheses (for the local
        inverse-depth interval, rows 1 and 2 — module.py:643).
      ndepths: number of new hypotheses D.
      split_itv: window half-width in units of the previous interval.
      height/width: output resolution (2x the input's spatial dims).

    Returns [B, D, H, W] depth hypotheses, bilinearly upsampled in inverse
    space with align_corners=True (matches the reference's trilinear resize —
    the depth axis is identity because D is unchanged by the resize).
    """
    last_itv = 1.0 / depth_hypo[:, 2] - 1.0 / depth_hypo[:, 1]  # [B, h, w]
    inv_min = 1.0 / depth + split_itv * last_itv
    inv_max = 1.0 / depth - split_itv * last_itv
    itv = jnp.arange(ndepths, dtype=depth.dtype) / (ndepths - 1)
    inv_hypo = inv_max[:, None] + (inv_min - inv_max)[:, None] * itv[None, :, None, None]
    inv_hypo = resize_bilinear(inv_hypo, (height, width), spatial_axes=(2, 3),
                               align_corners=True)
    return 1.0 / inv_hypo


def schedule_range(
    cur_depth: Array, ndepths: int, depth_interval_pixel: Array,
    height: int, width: int,
) -> Array:
    """Metric window +-D/2*interval around the previous depth, clamped >= 0.01.

    Spec: module.py:687-699. `depth_interval_pixel` is [B] (the per-sample
    interval scaled by the stage ratio).
    """
    dmin = cur_depth - ndepths / 2 * depth_interval_pixel[:, None, None]
    dmin = jnp.maximum(dmin, 0.01)
    dmax = cur_depth + ndepths / 2 * depth_interval_pixel[:, None, None]
    itv = (dmax - dmin) / (ndepths - 1)  # [B, h, w]
    steps = jnp.arange(ndepths, dtype=cur_depth.dtype)
    samples = dmin[:, None] + steps[None, :, None, None] * itv[:, None]
    samples = resize_bilinear(samples, (height, width), spatial_axes=(2, 3),
                              align_corners=True)
    return samples


def schedule_inverse_range_clamped(
    depth: Array, depth_hypo: Array, ndepths: int, split_itv: float,
    height: int, width: int, inv_floor: float = 0.02,
) -> Array:
    """ETH3D variant with the inverse-depth window clamped away from zero.

    Spec: module.py:668-684 — when the far edge of the window (inverse max
    depth) would cross `inv_floor`, shift the whole window so it sits at the
    floor instead.
    """
    last_itv = 1.0 / depth_hypo[:, 2] - 1.0 / depth_hypo[:, 1]
    inv_min = 1.0 / depth + split_itv * last_itv
    inv_max = 1.0 / depth - split_itv * last_itv
    is_neg = (inv_max < inv_floor).astype(depth.dtype)
    shift = (inv_max - inv_floor) * is_neg
    inv_max = inv_max - shift
    inv_min = inv_min - shift
    itv = jnp.arange(ndepths, dtype=depth.dtype) / (ndepths - 1)
    inv_hypo = inv_max[:, None] + (inv_min - inv_max)[:, None] * itv[None, :, None, None]
    inv_hypo = resize_bilinear(inv_hypo, (height, width), spatial_axes=(2, 3),
                               align_corners=True)
    return 1.0 / inv_hypo


def init_inverse_range_clamped(
    cur_depth: Array, ndepths: int, height: int, width: int,
    dmin: float = 0.01, dmax: float = 50.0,
) -> Array:
    """ETH3D init variant with the depth range clamped (module.py:656-665)."""
    return init_inverse_range(jnp.clip(cur_depth, dmin, dmax), ndepths, height, width)
