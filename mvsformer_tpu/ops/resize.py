"""Shape-static image resize ops with explicit corner-alignment semantics.

XLA/TPU note: `jax.image.resize` only implements half-pixel (align_corners
=False) sampling, but several reference code paths require align_corners=True
(FPN top-down upsampling, module.py:261-267; hypothesis-schedule trilinear
resize, module.py:652,698). We implement both conventions as gather+lerp along
one axis at a time — each pass is a static-shape gather that XLA fuses well.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

Array = jax.Array


def _linear_1d(x: Array, out_size: int, axis: int, align_corners: bool) -> Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    dtype = x.dtype
    pos = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        scale = (in_size - 1) / max(out_size - 1, 1)
        coords = pos * scale
    else:
        scale = in_size / out_size
        coords = jnp.clip((pos + 0.5) * scale - 0.5, 0.0, in_size - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    lo = jnp.clip(lo, 0, in_size - 2) if in_size > 1 else jnp.zeros_like(lo)
    w = (coords - lo.astype(jnp.float32)).astype(dtype)

    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, jnp.minimum(lo + 1, in_size - 1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = w.reshape(shape)
    return a * (1 - w) + b * w


def resize_bilinear(x: Array, out_hw, spatial_axes=(-3, -2), align_corners=True) -> Array:
    """Separable bilinear resize of the given two spatial axes."""
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    x = _linear_1d(x, out_hw[0], h_ax, align_corners)
    x = _linear_1d(x, out_hw[1], w_ax, align_corners)
    return x


def resize_nearest(x: Array, out_hw, spatial_axes=(-3, -2)) -> Array:
    """Nearest-neighbour resize (torch `mode='nearest'` semantics: floor(i*scale))."""
    def nearest_1d(x, out_size, axis):
        in_size = x.shape[axis]
        if in_size == out_size:
            return x
        idx = jnp.floor(jnp.arange(out_size, dtype=jnp.float32) * (in_size / out_size))
        idx = jnp.clip(idx.astype(jnp.int32), 0, in_size - 1)
        return jnp.take(x, idx, axis=axis)

    x = nearest_1d(x, out_hw[0], spatial_axes[0] % x.ndim)
    x = nearest_1d(x, out_hw[1], spatial_axes[1] % x.ndim)
    return x


def resize_bicubic(x: Array, out_hw, spatial_axes=(-3, -2)) -> Array:
    """Half-pixel bicubic resize (used for the 0.5x ViT input rescale).

    Uses jax.image.resize's Keys cubic kernel; matches torch bicubic
    align_corners=False up to the kernel's `a` constant — acceptable for an
    input-image rescale (documented deviation).
    """
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    shape = list(x.shape)
    shape[h_ax] = out_hw[0]
    shape[w_ax] = out_hw[1]
    return jax.image.resize(x, shape, method="cubic")
