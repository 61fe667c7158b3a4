"""Shape-static image resize ops with explicit corner-alignment semantics.

XLA/TPU note: `jax.image.resize` only implements half-pixel (align_corners
=False) sampling, but several reference code paths require align_corners=True
(FPN top-down upsampling, module.py:261-267; hypothesis-schedule trilinear
resize, module.py:652,698). We implement both conventions as gather+lerp along
one axis at a time — each pass is a static-shape gather that XLA fuses well.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array

# Debug override (read once at import): "auto" (default, per-axis choice —
# see _linear_1d), "matmul" (one big GEMM), or "phase" (shift+FMA).
_RESIZE2X_MODE = os.environ.get("MVSTPU_RESIZE2X", "auto")


def _shift(x: Array, delta: int, axis: int, edge: bool) -> Array:
    """x[k + delta] along axis, zero- or edge-padded at the border."""
    sl = [slice(None)] * x.ndim
    pad = [(0, 0)] * x.ndim
    if delta == 1:
        sl[axis] = slice(1, None)
        pad[axis] = (0, 1)
    else:
        sl[axis] = slice(0, -1)
        pad[axis] = (1, 0)
    return jnp.pad(x[tuple(sl)], pad, mode="edge" if edge else "constant")


def _linear_2x(x: Array, axis: int, align_corners: bool) -> Array:
    """Exact 2x linear upsample as two phases of shift+FMA (gather-free).

    The generic path gathers rows; on TPU those gathers ran ~3x off roofline
    (round-2 profile: 33 ms/frame in the FPN top-down up2 alone). For
    out = 2*in the sample positions split into two phases with static
    neighbours: even i=2k uses x[k-1], x[k]; odd i=2k+1 uses x[k], x[k+1] —
    only streaming shifts, per-row weight vectors, and a reshape interleave.
    align_corners=True: weights k/(2n-1) etc. (borders get weight 0, so zero
    padding is exact). align_corners=False: constant 0.25/0.75 weights with
    edge-replicated borders (the clamp in the generic path).
    """
    n = x.shape[axis]
    dtype = x.dtype
    if align_corners:
        k = jnp.arange(n, dtype=jnp.float32)
        be = (k / (2 * n - 1)).astype(dtype)          # weight on x[k-1]
        bo = ((n - 1 - k) / (2 * n - 1)).astype(dtype)  # weight on x[k+1]
        shape = [1] * x.ndim
        shape[axis] = n
        be = be.reshape(shape)
        bo = bo.reshape(shape)
        ye = (1 - be) * x + be * _shift(x, -1, axis, edge=False)
        yo = (1 - bo) * x + bo * _shift(x, +1, axis, edge=False)
    else:
        ye = 0.75 * x + 0.25 * _shift(x, -1, axis, edge=True)
        yo = 0.75 * x + 0.25 * _shift(x, +1, axis, edge=True)
    out = jnp.stack([ye, yo], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return out.reshape(new_shape).astype(dtype)


def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> Array:
    """Dense [out, in] linear resample matrix (2 nonzeros per row)."""
    pos = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        c = pos * ((in_size - 1) / max(out_size - 1, 1))
    else:
        c = jnp.clip((pos + 0.5) * (in_size / out_size) - 0.5,
                     0.0, in_size - 1)
    lo = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, max(in_size - 2, 0))
    f = c - lo.astype(jnp.float32)
    j = jnp.arange(in_size, dtype=jnp.int32)[None, :]
    return (jnp.where(j == lo[:, None], 1.0 - f[:, None], 0.0)
            + jnp.where(j == lo[:, None] + 1, f[:, None], 0.0))


def _linear_matmul(x: Array, out_size: int, axis: int,
                   align_corners: bool) -> Array:
    """Axis resize as a dense MXU matmul (2-nonzero rows).

    The shift+interleave form pays ~6x roofline in stack/reshape relayouts
    on big NHWC tensors (round-2 profile: ~39 ms/frame in the FPN up2); the
    dense matmul wastes FLOPs (in_size/2 useful) but streams cleanly:
    measured faster for the 2x upsample at the eval shape.
    """
    mat = _bilinear_matrix(x.shape[axis], out_size, align_corners)
    mat = mat.astype(jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype)
    # tensordot + moveaxis measured FASTER than the "no-transpose" batched
    # GEMM form (4.23 vs 3.76 dm/s) — XLA turns this into one big GEMM and
    # folds the moveaxis into downstream layouts.
    y = jnp.tensordot(mat, x, axes=(1, axis))  # [out, ...x-axes-minus-axis]
    return jnp.moveaxis(y, 0, axis).astype(x.dtype)


def _linear_1d(x: Array, out_size: int, axis: int, align_corners: bool) -> Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 2 * in_size and in_size > 1:
        # Axis-dependent 2x strategy (v5e-measured at the finest FPN level,
        # [5,576,768,64] bf16): on the sublane-tiled axis (ndim-2, W for
        # NHWC) the phase shift+FMA wins 10x (0.04 vs 0.38 ms — its
        # stack+reshape interleave is free there), while on untiled axes
        # the dense matmul wins ~6x (0.03 vs 0.19 ms — the phase form's
        # interleave relayouts dominate). MVSTPU_RESIZE2X=phase|matmul
        # forces one form for A/B runs.
        if _RESIZE2X_MODE == "matmul":
            return _linear_matmul(x, out_size, axis, align_corners)
        if _RESIZE2X_MODE == "phase":
            return _linear_2x(x, axis, align_corners)
        if axis == x.ndim - 2:
            return _linear_2x(x, axis, align_corners)
        return _linear_matmul(x, out_size, axis, align_corners)
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
    # NOTE: a joint 2x2 9-term formulation over a virtual nearest-upsample
    # was tried and HBM-OOMed at the eval shape (XLA materialized the padded
    # shifted copies at output resolution); the per-axis phase path below is
    # the measured-safe form.
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


def _cubic_kernel(t, a: float):
    """Keys cubic convolution kernel with free parameter `a`."""
    t = jnp.abs(t)
    w1 = (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0          # |t| <= 1
    w2 = a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a  # 1 < |t| < 2
    return jnp.where(t <= 1.0, w1, jnp.where(t < 2.0, w2, 0.0))


def _cubic_matrix(in_size: int, out_size: int, a: float) -> Array:
    """Dense [out,in] resampling matrix: torch bicubic align_corners=False
    (half-pixel centers, a=-0.75, border-replicated taps). Applying the
    resize as a matmul maps onto the MXU instead of 4-tap gathers."""
    pos = jnp.arange(out_size, dtype=jnp.float32)
    src = (pos + 0.5) * (in_size / out_size) - 0.5
    base = jnp.floor(src).astype(jnp.int32)
    mat = jnp.zeros((out_size, in_size), jnp.float32)
    for k in range(-1, 3):
        idx = base + k
        w = _cubic_kernel(src - idx.astype(jnp.float32), a)
        idx = jnp.clip(idx, 0, in_size - 1)  # border replication
        mat = mat.at[pos.astype(jnp.int32), idx].add(w)
    return mat


def resize_bicubic(x: Array, out_hw, spatial_axes=(-3, -2), a: float = -0.75) -> Array:
    """Bicubic resize matching torch `F.interpolate(mode='bicubic',
    align_corners=False)` bitward (a=-0.75, half-pixel, replicated borders) —
    the reference's ViT input rescale (mvsformer_model.py:215,360). Separable
    matmuls along each axis (MXU-friendly)."""
    h_ax = spatial_axes[0] % x.ndim
    w_ax = spatial_axes[1] % x.ndim
    dtype = x.dtype

    def apply_axis(x, axis, out_size):
        in_size = x.shape[axis]
        if in_size == out_size:
            return x
        mat = _cubic_matrix(in_size, out_size, a).astype(jnp.float32)
        xm = jnp.moveaxis(x, axis, -1).astype(jnp.float32)
        y = jnp.einsum("...i,oi->...o", xm, mat)
        return jnp.moveaxis(y, -1, axis)

    x = apply_axis(x, h_ax, out_hw[0])
    x = apply_axis(x, w_ax, out_hw[1])
    return x.astype(dtype)
