"""Data layer tests over a synthetic on-disk DTU/Blended scan."""

import os

import numpy as np
import pytest

from mvsformer_tpu.data.dtu import DTUMVSDataset, stage_proj_matrices, stage_pyramid
from mvsformer_tpu.data.eval_dataset import MVSEvalDataset
from mvsformer_tpu.data.loader import MVSLoader, collate
from mvsformer_tpu.utils.cams import CameraParams, write_cam_file
from mvsformer_tpu.utils.pfm import read_pfm, save_pfm

NV = 5  # views in the synthetic pair graph


def write_cam(path, vid, depth_min=425.0, depth_interval=2.5, num_depth=None):
    K = np.array([[1446.0, 0, 800.0], [0, 1446.0, 600.0], [0, 0, 1]], np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[0, 3] = vid * 3.0
    cam = CameraParams(ext, K, depth_min, depth_interval, num_depth)
    write_cam_file(path, cam)


def make_dtu_tree(root, scans=("scan1",), H=1200, W=1600):
    import cv2

    rng = np.random.default_rng(0)
    cam_dir = os.path.join(root, "Cameras")
    os.makedirs(cam_dir, exist_ok=True)
    with open(os.path.join(cam_dir, "pair.txt"), "w") as f:
        f.write(f"{NV}\n")
        for ref in range(NV):
            srcs = [v for v in range(NV) if v != ref]
            f.write(f"{ref}\n")
            f.write(f"{len(srcs)} " + " ".join(f"{s} {100 - i}" for i, s in enumerate(srcs)) + "\n")
    for vid in range(NV):
        write_cam(os.path.join(cam_dir, f"{vid:0>8}_cam.txt"), vid)

    for scan in scans:
        rect = os.path.join(root, "DTU_origin/Rectified", scan)
        draw = os.path.join(root, "Depths_raw", scan)
        os.makedirs(rect, exist_ok=True)
        os.makedirs(draw, exist_ok=True)
        for vid in range(NV):
            for light in range(7):
                img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                cv2.imwrite(os.path.join(rect, f"rect_{vid + 1:0>3}_{light}_r5000.png"), img)
            depth = rng.uniform(430, 880, (H, W)).astype(np.float32)
            save_pfm(os.path.join(draw, f"depth_map_{vid:0>4}.pfm"), depth)
            mask = (rng.uniform(size=(H, W)) > 0.2).astype(np.uint8) * 255
            cv2.imwrite(os.path.join(draw, f"depth_visual_{vid:0>4}.png"), mask)
    return root


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    # Small "original" resolution keeps the test fast; resize clipping math
    # references 1200x1600 but only produces a scale factor.
    return make_dtu_tree(str(tmp_path_factory.mktemp("dtu")), H=240, W=320)


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    d = rng.standard_normal((37, 53)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    save_pfm(p, d)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, d)


def test_dtu_train_sample(dtu_root):
    ms_args = {
        "scales": [[128, 160], [192, 256]],
        "resize_range": [1.0, 1.2],
        "scale_batch_map": {"128": 2, "192": 2},
    }
    ds = DTUMVSDataset(
        dtu_root, ["scan1"], "train", nviews=3, ndepths=48, crop=True,
        augment=True,
        aug_args=dict(brightness=0.2, contrast=0.1, saturation=0.1, hue=0.05,
                      min_gamma=0.9, max_gamma=1.1),
        multi_scale=True, multi_scale_args=ms_args, batch_size=2)
    ds.BASE_H, ds.BASE_W = 240, 320  # synthetic originals
    assert len(ds) == NV * 7
    ds.reset_dataset(np.arange(len(ds)))
    s = ds[0]
    V = 3
    ch, cw = ds.crop_size_for(0)
    assert s["imgs"].shape == (V, ch, cw, 3)
    assert s["depth_values"].shape == (48,)
    for i, key in enumerate(["stage1", "stage2", "stage3", "stage4"]):
        scale = (8, 4, 2, 1)[i]
        assert s["depth"][key].shape == (ch // scale, cw // scale)
        assert s["mask"][key].shape == (ch // scale, cw // scale)
        assert s["proj_matrices"][key].shape == (V, 2, 4, 4)
    # stage intrinsic scaling: stage1 fx = stage4 fx / 8
    np.testing.assert_allclose(
        s["proj_matrices"]["stage1"][0, 1, 0, 0],
        s["proj_matrices"]["stage4"][0, 1, 0, 0] / 8, rtol=1e-6)
    # mask has valid pixels at stage1 (the retry loop's contract)
    assert s["mask"]["stage1"].sum() > 0


def test_loader_barrel_consistency(dtu_root):
    ms_args = {
        "scales": [[128, 160], [192, 256]],
        "resize_range": [1.0, 1.2],
        "scale_batch_map": {"128": 2, "192": 2},
    }
    ds = DTUMVSDataset(
        dtu_root, ["scan1"], "train", nviews=3, ndepths=48, crop=True,
        multi_scale=True, multi_scale_args=ms_args, batch_size=2)
    ds.BASE_H, ds.BASE_W = 240, 320
    loader = MVSLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=1)
    loader.set_epoch(0)
    n = 0
    for batch in loader:
        assert batch["imgs"].ndim == 5  # [B, V, H, W, 3]
        assert batch["imgs"].shape[0] == 2
        n += 1
        if n >= 4:
            break
    assert n == 4


def test_loader_multihost_disjoint(dtu_root):
    ds0 = DTUMVSDataset(dtu_root, ["scan1"], "val", nviews=3, ndepths=48,
                        multi_scale=False, height=128, width=160)
    l0 = MVSLoader(ds0, batch_size=1, shuffle=True, seed=3, host_id=0, num_hosts=2)
    l1 = MVSLoader(ds0, batch_size=1, shuffle=True, seed=3, host_id=1, num_hosts=2)
    l0.set_epoch(5)
    l1.set_epoch(5)
    # Disjoint up to DistributedSampler-style pad duplicates (n=35 is odd, so
    # exactly one sample is replayed to even out the hosts).
    overlap = set(l0._host_idx.tolist()) & set(l1._host_idx.tolist())
    assert len(overlap) <= 1
    assert len(l0._host_idx) == len(l1._host_idx)


def make_eval_tree(root, scan="scan1"):
    import cv2

    rng = np.random.default_rng(0)
    sdir = os.path.join(root, scan)
    os.makedirs(os.path.join(sdir, "images"), exist_ok=True)
    os.makedirs(os.path.join(sdir, "cams"), exist_ok=True)
    with open(os.path.join(sdir, "pair.txt"), "w") as f:
        f.write(f"{NV}\n")
        for ref in range(NV):
            srcs = [v for v in range(NV) if v != ref]
            f.write(f"{ref}\n")
            f.write(f"{len(srcs)} " + " ".join(f"{s} {100 - i}" for i, s in enumerate(srcs)) + "\n")
    for vid in range(NV):
        img = rng.integers(0, 255, (300, 400, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(sdir, "images", f"{vid:0>8}.jpg"), img)
        write_cam(os.path.join(sdir, "cams", f"{vid:0>8}_cam.txt"), vid,
                  depth_min=425.0, depth_interval=2.5, num_depth=192)
    return root


def test_eval_dataset(tmp_path):
    root = make_eval_tree(str(tmp_path))
    ds = MVSEvalDataset(root, ["scan1"], nviews=5, ndepths=48,
                        interval_scale=1.06, max_h=128, max_w=160, dataset="dtu")
    assert len(ds) == NV
    s = ds[0]
    assert s["imgs"].shape == (5, 128, 160, 3)
    assert s["depth_values"].shape == (48,)
    assert set(s["proj_matrices"]) >= {"stage1", "stage2", "stage3", "stage4"}
    # stage4 == K_input: file K scaled by /4 then x4 and by resize ratios
    fx_file = 1446.0
    got_fx = s["proj_matrices"]["stage4"][0, 1, 0, 0]
    np.testing.assert_allclose(got_fx, fx_file / 4 * (160 / 400) * 4, rtol=1e-5)
    np.testing.assert_allclose(
        s["proj_matrices"]["stage1"][0, 1, 0, 0], got_fx / 8, rtol=1e-5)


def test_collate_nested():
    a = {"x": np.zeros((2, 3)), "y": {"z": np.ones(4)}, "s": "f"}
    b = {"x": np.zeros((2, 3)), "y": {"z": np.ones(4)}, "s": "g"}
    c = collate([a, b])
    assert c["x"].shape == (2, 2, 3)
    assert c["y"]["z"].shape == (2, 4)
    assert c["s"] == ["f", "g"]


def test_eval_dataset_tt_mode(tmp_path):
    """T&T mode: 4px edge pad, cy+4 intrinsic adjust, no GT."""
    root = make_eval_tree(str(tmp_path))
    ds = MVSEvalDataset(root, ["scan1"], nviews=3, ndepths=32,
                        interval_scale=1.0, max_h=128, max_w=160, dataset="tt")
    s = ds[0]
    assert s["imgs"].shape == (3, 128, 160, 3)
    assert "depth_gt" not in s
    # cy' = (cy_file + 4)/4 * scale_h * 4 at stage4; padded source height 308
    cy_file = 600.0
    scale_h = 128 / 308
    want_cy = (cy_file + 4) / 4 * scale_h * 4
    np.testing.assert_allclose(s["proj_matrices"]["stage4"][0, 1, 1, 2], want_cy,
                               rtol=1e-5)


def test_eval_dataset_iterative_mode(tmp_path):
    root = make_eval_tree(str(tmp_path))
    ds = MVSEvalDataset(root, ["scan1"], nviews=3, ndepths=32,
                        interval_scale=1.0, max_h=128, max_w=160,
                        dataset="dtu", iterative=True, refine=True)
    s = ds[0]
    fx4 = s["proj_matrices"]["stage4"][0, 1, 0, 0]
    fx5 = s["proj_matrices"]["stage5"][0, 1, 0, 0]
    np.testing.assert_allclose(fx5, fx4 * 2, rtol=1e-6)  # iterative: x2, x4
