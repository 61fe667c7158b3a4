"""Device-side multi-view depth-map fusion (geometric consistency filtering).

Replaces BOTH the reference's torch fusion ops (/root/reference/misc/fusion.py,
Vis-MVSNet-derived) and the external fusibile CUDA binary
(misc/gipuma.py:192-213) with pure JAX: the same consistency check runs as one
jitted program per scan on TPU — no external process, no host round-trips.

Algorithm (the standard MVSNet cross-view check, which both reference paths
compute): for each reference pixel p with depth d_ref, back-project to world,
project into a source view, bilinearly sample the source depth there,
back-project that source estimate and re-project into the reference view to
get (x', y', d'). A source view confirms p when |(x',y') - p| < dist_thresh
and |d' - d_ref| / d_ref < rel_diff_thresh. `pcd` uses fixed thresholds +
>= thres_view confirmations (misc/fusion.py:99-107); `dpcd` sweeps dynamic
per-count thresholds k/dist_base, k/rel_diff_base (misc/fusion.py:153-165,
test.py:505-511). Fused depth = visibility-averaged (misc/fusion.py:110-112).

Pixel centres are at integer+0.5 like the reference's get_pixel_grids
(misc/fusion.py:8-13).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvsformer_tpu.ops.geometry import bilinear_sample

Array = jax.Array


def _cam_parts(cam: Array):
    """cam: [..., 2, 4, 4] -> (extrinsic [...,4,4], K [...,3,3])."""
    return cam[..., 0, :, :], cam[..., 1, :3, :3]


def back_project(depth: Array, cam: Array) -> Array:
    """Lift ref pixels to world points. depth [B,H,W], cam [B,2,4,4] ->
    [B,H,W,3] world coordinates (pixel centres at +0.5)."""
    B, H, W = depth.shape
    ext, K = _cam_parts(cam)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    pix = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)  # [H,W,3]
    Kinv = jnp.linalg.inv(K)
    cam_pts = jnp.einsum("bij,hwj->bhwi", Kinv, pix)
    cam_pts = cam_pts / (cam_pts[..., 2:3] + 1e-9) * depth[..., None]
    cam_h = jnp.concatenate([cam_pts, jnp.ones_like(cam_pts[..., :1])], axis=-1)
    Einv = jnp.linalg.inv(ext)
    world_h = jnp.einsum("bij,bhwj->bhwi", Einv, cam_h)
    return world_h[..., :3] / (world_h[..., 3:4] + 1e-9)


def project(world: Array, cam: Array):
    """Project world points into a camera. world [B,H,W,3], cam [B,2,4,4] ->
    (xy [B,H,W,2] pixel coords with +0.5 centres, z [B,H,W] camera depth)."""
    ext, K = _cam_parts(cam)
    world_h = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    cam_h = jnp.einsum("bij,bhwj->bhwi", ext, world_h)
    cam_pts = cam_h[..., :3] / (cam_h[..., 3:4] + 1e-9)
    z = cam_pts[..., 2]
    img = jnp.einsum("bij,bhwj->bhwi", K, cam_pts)
    xy = img[..., :2] / (img[..., 2:3] + 1e-9)
    return xy, z


def reproject(ref_depth: Array, src_depth: Array, ref_cam: Array, src_cam: Array):
    """One source view's reprojection of all reference pixels.

    Returns (xy' [B,H,W,2], d' [B,H,W]): where the source's own geometry puts
    each reference pixel back in the reference view.
    """
    B, H, W = ref_depth.shape
    world = back_project(ref_depth, ref_cam)
    src_xy, _ = project(world, src_cam)
    # Sample source depth at the projected position (align-corners pixel
    # centres: subtract the 0.5 centre offset for the gather).
    px = src_xy[..., 0].reshape(B, -1) - 0.5
    py = src_xy[..., 1].reshape(B, -1) - 0.5
    d_src = bilinear_sample(src_depth[..., None], px, py).reshape(B, H, W)
    world2 = back_project_at(src_xy, d_src, src_cam)
    back_xy, back_z = project(world2, ref_cam)
    return back_xy, back_z


def back_project_at(xy: Array, depth: Array, cam: Array) -> Array:
    """Back-project arbitrary pixel positions xy [B,H,W,2] with depths."""
    ext, K = _cam_parts(cam)
    pix = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    Kinv = jnp.linalg.inv(K)
    cam_pts = jnp.einsum("bij,bhwj->bhwi", Kinv, pix)
    cam_pts = cam_pts / (cam_pts[..., 2:3] + 1e-9) * depth[..., None]
    cam_h = jnp.concatenate([cam_pts, jnp.ones_like(cam_pts[..., :1])], axis=-1)
    Einv = jnp.linalg.inv(ext)
    world_h = jnp.einsum("bij,bhwj->bhwi", Einv, cam_h)
    return world_h[..., :3] / (world_h[..., 3:4] + 1e-9)


def reproject_all(ref_depth: Array, src_depths: Array, ref_cam: Array,
                  src_cams: Array):
    """All source views. src_depths [B,V,H,W], src_cams [B,V,2,4,4] ->
    (xy [B,V,H,W,2], d [B,V,H,W])."""
    def per_view(sd, sc):
        return reproject(ref_depth, sd, ref_cam, sc)

    xy, d = jax.vmap(per_view, in_axes=(1, 1), out_axes=(1, 1))(src_depths, src_cams)
    return xy, d


def vis_filter(ref_depth: Array, reproj_xy: Array, reproj_d: Array,
               dist_thresh: float, rel_diff_thresh: float, thres_view: int):
    """Static consistency masks. Returns (per-view masks [B,V,H,W],
    combined [B,H,W])."""
    B, V, H, W = reproj_d.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    grid = jnp.stack([x, y], axis=-1)
    dist = jnp.linalg.norm(reproj_xy - grid[None, None], axis=-1)
    depth_diff = jnp.abs(ref_depth[:, None] - reproj_d)
    depth_ok = depth_diff < jnp.maximum(ref_depth[:, None], reproj_d) * rel_diff_thresh
    masks = (dist < dist_thresh) & depth_ok & (reproj_d > 0)
    combined = masks.sum(axis=1) >= (thres_view - 1.1)
    return masks, combined


def ave_fusion(ref_depth: Array, reproj_d: Array, masks: Array) -> Array:
    """Visibility-averaged fused depth (misc/fusion.py:110-112)."""
    m = masks.astype(ref_depth.dtype)
    return ((reproj_d * m).sum(axis=1) + ref_depth) / (m.sum(axis=1) + 1.0)


def vis_filter_dynamic(ref_depth: Array, reproj_xy: Array, reproj_d: Array,
                       dist_base: float = 4.0, rel_diff_base: float = 1300.0):
    """Dynamic-consistency masks: a pixel passes if >= k views agree at
    tolerance (k/dist_base px, k/rel_diff_base relative) for any k in
    [2, V+1) (misc/fusion.py:153-165 + test.py:505-511).

    Returns (per-view mask at the loosest k [B,V,H,W], combined geo mask
    [B,H,W]).
    """
    B, V, H, W = reproj_d.shape
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    grid = jnp.stack([x, y], axis=-1)
    dist = jnp.linalg.norm(reproj_xy - grid[None, None], axis=-1)  # [B,V,H,W]
    rel = jnp.abs(ref_depth[:, None] - reproj_d) / (ref_depth[:, None] + 1e-9)

    ks = jnp.arange(2, V + 2, dtype=jnp.float32)  # [V] tolerance levels
    masks_k = (dist[:, :, None] < ks[None, None, :, None, None] / dist_base) & \
              (rel[:, :, None] < ks[None, None, :, None, None] / rel_diff_base)
    # counts per tolerance level: [B, V(levels), H, W]
    counts = masks_k.sum(axis=1)
    geo = jnp.zeros((B, H, W), bool)
    for i in range(2, V + 2):
        geo = geo | (counts[:, i - 2] >= i)
    loosest = masks_k[:, :, -1]  # per-view mask at the final (loosest) level
    return loosest, geo


def fuse_pcd(ref_depth, src_depths, ref_cam, src_cams, ref_conf,
             prob_threshold, dist_thresh=1.0, rel_diff_thresh=0.01,
             thres_view=5):
    """Full static fusion for one reference view (test.py filter_depth body).

    ref_conf: [B,H,W] (combined confidence) or [B,S,H,W] per-stage stack with
    prob_threshold a list of per-stage thresholds.
    Returns (mask [B,H,W] bool, fused_depth [B,H,W], world_points [B,H,W,3]).
    """
    if ref_conf.ndim == 4:
        prob_mask = jnp.ones(ref_conf.shape[:1] + ref_conf.shape[2:], bool)
        for i, th in enumerate(prob_threshold):
            prob_mask = prob_mask & (ref_conf[:, i] > th)
    else:
        th = prob_threshold[0] if isinstance(prob_threshold, (list, tuple)) else prob_threshold
        prob_mask = ref_conf > th

    xy, d = reproject_all(ref_depth, src_depths, ref_cam, src_cams)
    masks, vis_mask = vis_filter(ref_depth, xy, d, dist_thresh, rel_diff_thresh,
                                 thres_view)
    fused = ave_fusion(ref_depth, d, masks)
    mask = prob_mask & vis_mask
    points = back_project(fused, ref_cam)
    return mask, fused, points


def fuse_dpcd(ref_depth, src_depths, ref_cam, src_cams, ref_conf,
              prob_threshold, dist_base=4.0, rel_diff_base=1300.0):
    """Full dynamic fusion for one reference view (test.py dynamic_filter_depth)."""
    if ref_conf.ndim == 4:
        prob_mask = jnp.ones(ref_conf.shape[:1] + ref_conf.shape[2:], bool)
        for i, th in enumerate(prob_threshold):
            prob_mask = prob_mask & (ref_conf[:, i] > th)
    else:
        th = prob_threshold[0] if isinstance(prob_threshold, (list, tuple)) else prob_threshold
        prob_mask = ref_conf > th

    xy, d = reproject_all(ref_depth, src_depths, ref_cam, src_cams)
    loosest, geo_mask = vis_filter_dynamic(ref_depth, xy, d, dist_base, rel_diff_base)
    d_masked = jnp.where(loosest, d, 0.0)
    cnt = loosest.sum(axis=1).astype(ref_depth.dtype)
    fused = (d_masked.sum(axis=1) + ref_depth) / (cnt + 1.0)
    mask = prob_mask & geo_mask
    points = back_project(fused, ref_cam)
    return mask, fused, points


def vis_filter_disparity(ref_depth: Array, src_depths: Array, ref_cam: Array,
                         src_cams: Array, disp_thresh: float,
                         num_consistent: int, want_reproj_depth: bool = False):
    """Fusibile-style consistency in DISPARITY space (the semantics behind
    misc/gipuma.py:192-213's --disp_thresh / --num_consistent flags).

    For each reference pixel: project its 3D point into source view v giving
    depth z_v; sample that view's own depth estimate d_v at the landing
    pixel; view v confirms the pixel when the equivalent-disparity difference
    f_v * b_v * |1/z_v - 1/d_v| < disp_thresh, where b_v is the camera-centre
    baseline and f_v the source focal length. This converts a metric depth
    difference into the resolution-aware pixel-disparity unit fusibile
    thresholds on, removing the previous dist_thresh = 10*disp heuristic.

    Returns (per-view masks [B,V,H,W], combined [B,H,W]); with
    want_reproj_depth also the source views' reprojected reference-frame
    depth d' [B,V,H,W] (reusing this pass's projection + d_v sample rather
    than running reproject_all a second time).
    """
    B, H, W = ref_depth.shape
    world = back_project(ref_depth, ref_cam)
    ref_ext, _ = _cam_parts(ref_cam)
    ref_center = jnp.linalg.inv(ref_ext)[..., :3, 3]  # [B,3]

    def per_view(src_depth, src_cam):
        xy, z = project(world, src_cam)
        px = xy[..., 0].reshape(B, -1) - 0.5
        py = xy[..., 1].reshape(B, -1) - 0.5
        d_v = bilinear_sample(src_depth[..., None], px, py).reshape(B, H, W)
        ext, K = _cam_parts(src_cam)
        center = jnp.linalg.inv(ext)[..., :3, 3]
        b = jnp.linalg.norm(center - ref_center, axis=-1)  # [B]
        f = K[..., 0, 0]
        fb = (f * b)[:, None, None]
        disp_diff = fb * jnp.abs(1.0 / jnp.maximum(z, 1e-6)
                                 - 1.0 / jnp.maximum(d_v, 1e-6))
        inside = (xy[..., 0] >= 0) & (xy[..., 0] < W) & \
                 (xy[..., 1] >= 0) & (xy[..., 1] < H)
        mask = (disp_diff < disp_thresh) & (d_v > 0) & (z > 0) & inside
        if want_reproj_depth:
            world2 = back_project_at(xy, d_v, src_cam)
            _, back_z = project(world2, ref_cam)
            return mask, back_z
        return mask, jnp.zeros_like(d_v)

    masks, reproj_d = jax.vmap(per_view, in_axes=(1, 1), out_axes=(1, 1))(
        src_depths, src_cams)
    combined = masks.sum(axis=1) >= num_consistent
    if want_reproj_depth:
        return masks, combined, reproj_d
    return masks, combined


def fuse_gipuma(ref_depth, src_depths, ref_cam, src_cams, ref_conf,
                prob_threshold, disp_thresh=0.1, num_consistent=2):
    """Fusibile-equivalent fusion for one reference view: probability
    pre-filter (misc/gipuma.py:160-189) + disparity-space consistency +
    visibility-averaged depth. Returns (mask, fused_depth, world_points)."""
    if ref_conf.ndim == 4:
        prob_mask = jnp.ones(ref_conf.shape[:1] + ref_conf.shape[2:], bool)
        for i, th in enumerate(prob_threshold):
            prob_mask = prob_mask & (ref_conf[:, i] > th)
    else:
        th = prob_threshold[0] if isinstance(prob_threshold, (list, tuple)) else prob_threshold
        prob_mask = ref_conf > th

    masks, vis_mask, d = vis_filter_disparity(
        ref_depth, src_depths, ref_cam, src_cams, disp_thresh, num_consistent,
        want_reproj_depth=True)
    fused = ave_fusion(ref_depth, d, masks & (d > 0))
    mask = prob_mask & vis_mask
    points = back_project(fused, ref_cam)
    return mask, fused, points
