"""Fusion tests on an analytic scene (fronto-parallel plane, known cameras)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from mvsformer_tpu.ops import fusion as F
from mvsformer_tpu.utils.cams import CameraParams, write_cam_file
from mvsformer_tpu.utils.pfm import save_pfm
from mvsformer_tpu.utils.ply import read_ply, write_ply

H, W = 48, 64
DEPTH = 500.0
K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], np.float32)


def cam(tx):
    ext = np.eye(4, dtype=np.float32)
    ext[0, 3] = tx
    c = np.zeros((2, 4, 4), np.float32)
    c[0] = ext
    c[1, :3, :3] = K
    c[1, 3, 3] = 1
    return c


def plane_scene(n_src=4):
    """Plane z=DEPTH; all depth maps are constant DEPTH (exact geometry)."""
    ref_cam = cam(0.0)
    src_cams = np.stack([cam((i + 1) * 5.0) for i in range(n_src)])
    ref_depth = np.full((H, W), DEPTH, np.float32)
    src_depths = np.full((n_src, H, W), DEPTH, np.float32)
    return ref_depth, src_depths, ref_cam, src_cams


def test_reproject_identity_on_plane():
    ref_depth, src_depths, ref_cam, src_cams = plane_scene()
    xy, d = F.reproject_all(
        jnp.asarray(ref_depth[None]), jnp.asarray(src_depths[None]),
        jnp.asarray(ref_cam[None]), jnp.asarray(src_cams[None]))
    xy = np.asarray(xy[0])
    d = np.asarray(d[0])
    # Pixels whose projection stays inside the source frustum must come back
    # exactly (plane geometry is exact). Check the interior region.
    interior = np.s_[:, 8:-8, 16:-16]
    grid_x = np.arange(W, dtype=np.float32)[None, None, :] + 0.5
    grid_y = np.arange(H, dtype=np.float32)[None, :, None] + 0.5
    np.testing.assert_allclose(xy[..., 0][interior],
                               np.broadcast_to(grid_x, d.shape)[interior], atol=1e-2)
    np.testing.assert_allclose(xy[..., 1][interior],
                               np.broadcast_to(grid_y, d.shape)[interior], atol=1e-2)
    np.testing.assert_allclose(d[interior], DEPTH, rtol=1e-4)


def test_vis_filter_and_fusion():
    ref_depth, src_depths, ref_cam, src_cams = plane_scene()
    # Corrupt source 0 entirely: it should never confirm.
    src_depths[0] = DEPTH * 1.5
    mask, fused, points = F.fuse_pcd(
        jnp.asarray(ref_depth[None]), jnp.asarray(src_depths[None]),
        jnp.asarray(ref_cam[None]), jnp.asarray(src_cams[None]),
        jnp.asarray(np.ones((1, H, W), np.float32)),
        prob_threshold=(0.5,), thres_view=3)
    mask = np.asarray(mask[0])
    fused = np.asarray(fused[0])
    points = np.asarray(points[0])
    # Interior pixels confirmed by the 3 good views.
    assert mask[8:-8, 16:-16].all()
    np.testing.assert_allclose(fused[mask], DEPTH, rtol=1e-4)
    # Back-projected points lie on the z=DEPTH plane.
    np.testing.assert_allclose(points[mask][:, 2], DEPTH, rtol=1e-4)


def test_vis_filter_rejects_inconsistent():
    ref_depth, src_depths, ref_cam, src_cams = plane_scene()
    src_depths[:] = DEPTH * 1.5  # nothing agrees
    mask, fused, _ = F.fuse_pcd(
        jnp.asarray(ref_depth[None]), jnp.asarray(src_depths[None]),
        jnp.asarray(ref_cam[None]), jnp.asarray(src_cams[None]),
        jnp.asarray(np.ones((1, H, W), np.float32)),
        prob_threshold=(0.5,), thres_view=3)
    assert not np.asarray(mask).any()


def test_dynamic_fusion_on_plane():
    ref_depth, src_depths, ref_cam, src_cams = plane_scene()
    mask, fused, points = F.fuse_dpcd(
        jnp.asarray(ref_depth[None]), jnp.asarray(src_depths[None]),
        jnp.asarray(ref_cam[None]), jnp.asarray(src_cams[None]),
        jnp.asarray(np.ones((1, H, W), np.float32)),
        prob_threshold=(0.5,))
    mask = np.asarray(mask[0])
    assert mask[8:-8, 16:-16].all()
    np.testing.assert_allclose(np.asarray(fused[0])[mask], DEPTH, rtol=1e-4)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (100, 3), dtype=np.uint8)
    p = str(tmp_path / "x.ply")
    write_ply(p, pts, cols)
    back_p, back_c = read_ply(p)
    np.testing.assert_array_equal(back_p, pts)
    np.testing.assert_array_equal(back_c, cols)


def test_fuse_scan_end_to_end(tmp_path):
    """Write phase-1 artifacts for the plane scene, run fuse_scan, read PLY."""
    import cv2

    n_views = 5
    scan = str(tmp_path / "scan1")
    for sub in ("depth_est", "confidence", "cams", "images"):
        os.makedirs(os.path.join(scan, sub), exist_ok=True)
    with open(os.path.join(scan, "pair.txt"), "w") as f:
        f.write(f"{n_views}\n")
        for ref in range(n_views):
            srcs = [v for v in range(n_views) if v != ref]
            f.write(f"{ref}\n")
            f.write(f"{len(srcs)} " + " ".join(f"{s} {10 - i}" for i, s in enumerate(srcs)) + "\n")
    for vid in range(n_views):
        save_pfm(os.path.join(scan, "depth_est", f"{vid:0>8}.pfm"),
                 np.full((H, W), DEPTH, np.float32))
        np.save(os.path.join(scan, "confidence", f"{vid:0>8}.npy"),
                np.ones((H, W), np.float32))
        c = cam(vid * 5.0)
        write_cam_file(os.path.join(scan, "cams", f"{vid:0>8}_cam.txt"),
                       CameraParams(c[0], c[1, :3, :3], 400.0, 2.5))
        cv2.imwrite(os.path.join(scan, "images", f"{vid:0>8}.jpg"),
                    np.full((H, W, 3), 128, np.uint8))

    ply = str(tmp_path / "out.ply")
    n = F and __import__("mvsformer_tpu.fuse", fromlist=["fuse_scan"]).fuse_scan(
        scan, scan, ply, method="pcd", prob_threshold=(0.5,), thres_view=3,
        n_src_views=4, logger=lambda *a: None)
    assert n > 1000
    pts, cols = read_ply(ply)
    np.testing.assert_allclose(pts[:, 2], DEPTH, rtol=1e-3)


def test_gipuma_threshold_mapping_inclusion():
    """The gipuma-compat CLI path maps fusibile flags to device-side
    thresholds (test.py: dist=disp_threshold*10, views=num_consistent+1,
    misc/gipuma.py:192-213). Validate the monotone inclusion property that
    mapping relies on: the looser gipuma-mapped thresholds keep a superset
    of the strict pcd mask on a noisy scene."""
    rng = np.random.default_rng(0)
    ref_depth, src_depths, ref_cam, src_cams = plane_scene()
    # Per-pixel noise: some pixels fail tight reproj/consistency thresholds.
    src_depths = src_depths + rng.normal(0.0, 2.0, src_depths.shape).astype(np.float32)

    def run(dist_thresh, thres_view):
        mask, _, _ = F.fuse_pcd(
            jnp.asarray(ref_depth[None]), jnp.asarray(src_depths[None]),
            jnp.asarray(ref_cam[None]), jnp.asarray(src_cams[None]),
            jnp.asarray(np.ones((1, H, W), np.float32)),
            prob_threshold=(0.5,), dist_thresh=dist_thresh,
            thres_view=thres_view)
        return np.asarray(mask[0])

    strict = run(dist_thresh=0.25, thres_view=4)
    # gipuma defaults: disp_threshold 0.1 -> dist 1.0, num_consistent 2 -> 3
    gipuma = run(dist_thresh=0.1 * 10, thres_view=2 + 1)
    assert strict.any() and gipuma.any()
    assert (strict & ~gipuma).sum() == 0, "strict mask must be a subset"
    assert gipuma.sum() > strict.sum(), "looser thresholds must keep more"


def test_fuse_scan_stacked_confidence(tmp_path):
    """--no-combine_conf writes stacked per-stage confidences [4,H,W]
    (test.py:280-293); fusion must consume per-stage thresholds for both the
    ref mask and the source pre-mask (test.py:414-419)."""
    import cv2

    from mvsformer_tpu.fuse import fuse_scan

    n_views = 5
    scan = str(tmp_path / "scan1")
    for sub in ("depth_est", "confidence", "cams", "images"):
        os.makedirs(os.path.join(scan, sub), exist_ok=True)
    with open(os.path.join(scan, "pair.txt"), "w") as f:
        f.write(f"{n_views}\n")
        for ref in range(n_views):
            srcs = [v for v in range(n_views) if v != ref]
            f.write(f"{ref}\n")
            f.write(f"{len(srcs)} " + " ".join(
                f"{s} {10 - i}" for i, s in enumerate(srcs)) + "\n")
    for vid in range(n_views):
        save_pfm(os.path.join(scan, "depth_est", f"{vid:0>8}.pfm"),
                 np.full((H, W), DEPTH, np.float32))
        conf = np.ones((4, H, W), np.float32)
        # stage-2 confidence low on the left half -> those pixels must drop
        conf[1, :, : W // 2] = 0.1
        np.save(os.path.join(scan, "confidence", f"{vid:0>8}.npy"), conf)
        c = cam(vid * 5.0)
        write_cam_file(os.path.join(scan, "cams", f"{vid:0>8}_cam.txt"),
                       CameraParams(c[0], c[1, :3, :3], 400.0, 2.5))
        cv2.imwrite(os.path.join(scan, "images", f"{vid:0>8}.jpg"),
                    np.full((H, W, 3), 128, np.uint8))

    ply = str(tmp_path / "out.ply")
    n = fuse_scan(scan, scan, ply, method="pcd",
                  prob_threshold=(0.5, 0.5, 0.5, 0.5), thres_view=3,
                  n_src_views=4, logger=lambda *a: None)
    assert n > 100
    pts, _ = read_ply(ply)
    np.testing.assert_allclose(pts[:, 2], DEPTH, rtol=1e-3)

    # Same scene with uniformly high stacked confidence keeps roughly twice
    # as many points: the low stage-2 left half must drop through BOTH the
    # ref prob mask and the source pre-mask.
    for vid in range(n_views):
        np.save(os.path.join(scan, "confidence", f"{vid:0>8}.npy"),
                np.ones((4, H, W), np.float32))
    ply2 = str(tmp_path / "out2.ply")
    n_all = fuse_scan(scan, scan, ply2, method="pcd",
                      prob_threshold=(0.5, 0.5, 0.5, 0.5), thres_view=3,
                      n_src_views=4, logger=lambda *a: None)
    assert 0.3 * n_all < n < 0.7 * n_all, (n, n_all)


def test_gipuma_disparity_consistency():
    """fuse_gipuma thresholds in disparity units f*b*|1/z - 1/d|: a metric
    depth error passes or fails depending on each view's baseline, matching
    fusibile's resolution-aware --disp_thresh semantics."""
    ref_depth, src_depths, ref_cam, src_cams = plane_scene()
    conf = jnp.asarray(np.ones((1, H, W), np.float32))

    # Exact geometry: every interior pixel confirmed by all views.
    mask, fused, _ = F.fuse_gipuma(
        jnp.asarray(ref_depth[None]), jnp.asarray(src_depths[None]),
        jnp.asarray(ref_cam[None]), jnp.asarray(src_cams[None]), conf,
        prob_threshold=(0.5,), disp_thresh=0.1, num_consistent=3)
    m = np.asarray(mask[0])
    assert m[8:-8, 16:-16].all()
    np.testing.assert_allclose(np.asarray(fused[0])[m], DEPTH, rtol=1e-4)

    # +100 depth error in every source: disparity error scales with baseline
    # b_v (f*b*100/(500*600) = 0.2, 0.4, 0.6, 0.8 px for b=5,10,15,20).
    bad = src_depths + 100.0
    mask, _, _ = F.fuse_gipuma(
        jnp.asarray(ref_depth[None]), jnp.asarray(bad[None]),
        jnp.asarray(ref_cam[None]), jnp.asarray(src_cams[None]), conf,
        prob_threshold=(0.5,), disp_thresh=0.1, num_consistent=2)
    assert not np.asarray(mask[0]).any()

    # At 0.5 px tolerance only the two nearest baselines (0.2, 0.4) pass ->
    # num_consistent=2 keeps, num_consistent=3 rejects.
    mask2, _, _ = F.fuse_gipuma(
        jnp.asarray(ref_depth[None]), jnp.asarray(bad[None]),
        jnp.asarray(ref_cam[None]), jnp.asarray(src_cams[None]), conf,
        prob_threshold=(0.5,), disp_thresh=0.5, num_consistent=2)
    m2 = np.asarray(mask2[0])
    assert m2[8:-8, 16:-16].all()
    mask3, _, _ = F.fuse_gipuma(
        jnp.asarray(ref_depth[None]), jnp.asarray(bad[None]),
        jnp.asarray(ref_cam[None]), jnp.asarray(src_cams[None]), conf,
        prob_threshold=(0.5,), disp_thresh=0.5, num_consistent=3)
    assert not np.asarray(mask3[0]).any()
