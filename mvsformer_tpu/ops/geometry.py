"""Projective geometry for plane-sweep multi-view stereo.

TPU-first design notes
----------------------
Everything here is pure, shape-static and jit-friendly. Feature maps use the
TPU-native NHWC layout ([B, H, W, C]); plane-sweep volumes are [B, D, H, W, C]
(channels-last NDHWC so that 3-D convolutions and MXU contractions see a
contiguous lane dimension).

Functional spec: the reference implementation's homography warp
(/root/reference/models/warping.py:69-109) — `proj = src_proj @ inv(ref_proj)`,
pixel grid lifted to every depth hypothesis, projected into the source view and
bilinearly sampled with zero padding, plus an out-of-frustum / behind-camera
mask. We re-derive the math here rather than port the torch code: the sampling
is expressed as four masked gathers so XLA lowers it to TPU-friendly dynamic
gathers; a fused Pallas warp+correlation kernel rides on the same coordinate
computation (see mvsformer_tpu/ops/pallas/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def compose_projection(proj: Array) -> Array:
    """Fold intrinsics into the extrinsic matrix.

    `proj` is the per-view camera stack [..., 2, 4, 4]: slot 0 holds the 4x4
    world->camera extrinsic, slot 1 holds the 3x3 intrinsic K in its upper-left
    block (contract shared with the data layer; reference:
    mvsformer_model.py:69-72). Returns the full 4x4 projective matrix with
    `K @ [R|t]` in the top three rows.
    """
    ext = proj[..., 0, :, :]
    intr = proj[..., 1, :3, :3]
    top = jnp.einsum("...ij,...jk->...ik", intr, ext[..., :3, :])
    return ext.at[..., :3, :].set(top)


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> Array:
    """Homogeneous pixel coordinates [3, H*W] with (x, y, 1) rows."""
    y = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    x = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    ones = jnp.ones_like(x)
    return jnp.stack([x.reshape(-1), y.reshape(-1), ones.reshape(-1)], axis=0)


def plane_sweep_coords(
    src_proj: Array,
    ref_proj: Array,
    depth_values: Array,
    height: int,
    width: int,
):
    """Source-view sampling coordinates for every (depth, pixel) pair.

    Args:
      src_proj:  [B, 4, 4] composed projection of the source view.
      ref_proj:  [B, 4, 4] composed projection of the reference view.
      depth_values: [B, D] or [B, D, H, W] depth hypotheses.
      height/width: spatial size of the (reference-resolution) feature map.

    Returns:
      (px, py, invalid): source-image pixel coordinates [B, D, H*W] (unnormalized,
      align-corners convention: integer coords hit texel centres) and a boolean
      mask [B, D, H, W] that is True where the projection falls outside the
      source frustum or behind the camera (z <= 0).
    """
    B = src_proj.shape[0]
    D = depth_values.shape[1]
    # Relative projection ref->src. Coordinate math MUST run at full fp32
    # precision: on TPU the default matmul precision demotes fp32 matmuls to
    # bf16 passes, which is catastrophic for pixel coordinates (~1e3 magnitude,
    # sub-0.01 accuracy needed for bilinear taps).
    highest = jax.lax.Precision.HIGHEST
    proj = jnp.matmul(src_proj, jnp.linalg.inv(ref_proj), precision=highest)
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    xyz = pixel_grid(height, width, dtype=proj.dtype)  # [3, HW]
    rot_xyz = jnp.einsum("bij,jk->bik", rot, xyz, precision=highest)  # [B, 3, HW]
    depth = depth_values.reshape(B, 1, D, -1)  # [B,1,D,1] or [B,1,D,HW]
    proj_xyz = rot_xyz[:, :, None, :] * depth + trans[:, :, None, None]
    z = proj_xyz[:, 2]  # [B, D, HW]
    px = proj_xyz[:, 0] / (z + 1e-6)
    py = proj_xyz[:, 1] / (z + 1e-6)

    x_out = (px < 0.0) | (px > width - 1)
    y_out = (py < 0.0) | (py > height - 1)
    invalid = (x_out | y_out | (z <= 0.0)).reshape(B, D, height, width)
    return px, py, invalid


def bilinear_sample(src: Array, px: Array, py: Array) -> Array:
    """Bilinearly sample `src` [B, H, W, C] at pixel coords px/py [B, N].

    Out-of-bounds taps contribute zero (grid_sample padding_mode='zeros',
    align_corners=True semantics). Returns [B, N, C].
    """
    B, H, W, C = src.shape
    src_flat = src.reshape(B, H * W, C)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    for dy, wgt_y in ((0, 1.0 - wy), (1, wy)):
        for dx, wgt_x in ((0, 1.0 - wx), (1, wx)):
            xi = x0i + dx
            yi = y0i + dy
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            tap = jnp.take_along_axis(src_flat, idx[..., None], axis=1)
            w = (wgt_x * wgt_y * valid).astype(src.dtype)[..., None]
            out = tap * w if out is None else out + tap * w
    return out


def homo_warp(
    src_fea: Array,
    src_proj: Array,
    ref_proj: Array,
    depth_values: Array,
    stop_coord_gradient: bool = True,
):
    """Plane-sweep warp of source features onto reference depth hypotheses.

    Args:
      src_fea: [B, H, W, C] source-view feature map (NHWC).
      src_proj/ref_proj: [B, 4, 4] composed projection matrices.
      depth_values: [B, D] or [B, D, H, W].
      stop_coord_gradient: match the reference's `no_grad` around the
        coordinate computation (warping.py:79); the differentiable variant
        (warping.py:112-152) is `stop_coord_gradient=False`.

    Returns:
      (warped, invalid): [B, D, H, W, C] warped volume and [B, D, H, W] bool
      mask (True where out-of-frustum / behind camera).
    """
    B, H, W, C = src_fea.shape
    D = depth_values.shape[1]
    px, py, invalid = plane_sweep_coords(src_proj, ref_proj, depth_values, H, W)
    if stop_coord_gradient:
        px = jax.lax.stop_gradient(px)
        py = jax.lax.stop_gradient(py)
        invalid = jax.lax.stop_gradient(invalid)
    warped = bilinear_sample(src_fea, px.reshape(B, -1), py.reshape(B, -1))
    return warped.reshape(B, D, H, W, C), invalid
