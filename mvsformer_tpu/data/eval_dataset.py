"""Test-time dataset for DTU / Tanks-and-Temples evaluation.

Functional spec: /root/reference/datasets/general_eval.py — per-scan pair.txt
view selection with source padding, intrinsics/4 (eval images ship at quarter
resolution) with the T&T cy+4 edge-pad adjustment, resize to max_h x max_w,
per-stage projection matrices (net effect: stage1..4 = K/8..K/1 of the resized
input, plus a duplicate stage5 for 5-stage refine models), and DTU GT
depth/mask loading for depth metrics.
"""

from __future__ import annotations

import os

import numpy as np

from mvsformer_tpu.data.augment import normalize
from mvsformer_tpu.utils.cams import read_pair_file
from mvsformer_tpu.utils.pfm import read_pfm


class MVSEvalDataset:
    def __init__(self, datapath, listfile, nviews=5, ndepths=192,
                 interval_scale=1.06, max_h=864, max_w=1152, fix_res=False,
                 dataset="dtu", refine=True, use_short_range=False,
                 iterative=False, **kwargs):
        self.datapath = datapath
        self.nviews = nviews
        self.ndepths = ndepths
        self.max_h, self.max_w = max_h, max_w
        self.fix_res = fix_res
        self.fix_wh = False
        self.dataset = dataset
        self.refine = refine
        self.use_short_range = use_short_range
        self.iterative = iterative  # iterative-inference proj scaling
                                    # (general_eval.py:226-246)
        self.s_h = self.s_w = None

        if isinstance(listfile, (list, tuple)):
            scans = list(listfile)
        else:
            with open(listfile) as f:
                scans = [line.rstrip() for line in f if line.strip()]

        if isinstance(interval_scale, dict):
            self.interval_scale = interval_scale
        else:
            self.interval_scale = {s: interval_scale for s in scans}

        self.metas = []
        for scan in scans:
            pair = read_pair_file(os.path.join(self.datapath, scan, "pair.txt"))
            for ref, srcs in pair:
                if len(srcs) == 0:
                    continue
                if len(srcs) < self.nviews - 1:
                    srcs = srcs + [srcs[0]] * (self.nviews - 1 - len(srcs))
                self.metas.append((scan, ref, srcs[: self.nviews - 1]))

    def __len__(self):
        return len(self.metas)

    def _read_cam(self, path, interval_scale):
        with open(path) as f:
            lines = [line.rstrip() for line in f]
        extr = np.fromstring(" ".join(lines[1:5]), np.float32, sep=" ").reshape(4, 4)
        intr = np.fromstring(" ".join(lines[7:10]), np.float32, sep=" ").reshape(3, 3)
        if self.dataset == "tt":
            intr[1, 2] += 4  # edge-pad compensation (general_eval.py:88-90)
        intr[:2, :] /= 4.0
        fields = lines[11].split()
        depth_min = float(fields[0])
        depth_interval = 2.5 if "cams_1" in path else float(fields[1])
        if len(fields) >= 3:
            depth_max = depth_min + int(float(fields[2])) * depth_interval
            depth_interval = (depth_max - depth_min) / self.ndepths
        depth_interval *= interval_scale
        return intr, extr, depth_min, depth_interval

    def _read_img(self, path):
        import cv2

        img = cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        if self.dataset == "tt":
            img = np.pad(img, ((4, 4), (0, 0), (0, 0)), "edge")
        return img

    def _cam_path(self, scan, vid):
        if self.dataset == "tt":
            if self.use_short_range:
                return os.path.join(
                    self.datapath, f"short_range_cameras/cams_{scan.lower()}/{vid:0>8}_cam.txt")
            return os.path.join(self.datapath, scan, "cams", f"{vid:0>8}_cam.txt")
        p = os.path.join(self.datapath, scan, "cams_1", f"{vid:0>8}_cam.txt")
        if not os.path.exists(p):
            p = os.path.join(self.datapath, scan, "cams", f"{vid:0>8}_cam.txt")
        return p

    def __getitem__(self, idx):
        import cv2

        scan, ref, srcs = self.metas[idx]
        view_ids = [ref] + list(srcs)
        imgs, projs = [], []
        depth_values = None
        gt_depth = gt_mask = None

        for i, vid in enumerate(view_ids):
            img = self._read_img(os.path.join(self.datapath, scan, "images", f"{vid:0>8}.jpg"))
            intr, extr, dmin, ditv = self._read_cam(
                self._cam_path(scan, vid), self.interval_scale[scan])

            # Direct resize to (max_w, max_h) with PER-AXIS intrinsic scaling
            # (general_eval.py:117-128 scale_mvs_input does exactly this):
            # fx scales by w-ratio and fy by h-ratio independently, so a
            # non-uniform resize stays geometrically consistent — anisotropic
            # pixels are modeled by the intrinsics, not an approximation.
            h, w = img.shape[:2]
            intr[0, :] *= self.max_w / w
            intr[1, :] *= self.max_h / h
            img = cv2.resize(img, (self.max_w, self.max_h))

            if self.fix_res and self.s_h is None:
                self.s_h, self.s_w = img.shape[:2]

            proj = np.zeros((2, 4, 4), np.float32)
            proj[0] = extr
            proj[1, :3, :3] = intr
            projs.append(proj)
            imgs.append(normalize(img.astype(np.float32) / 255.0))

            if i == 0:
                depth_values = np.arange(
                    dmin, ditv * (self.ndepths - 0.5) + dmin, ditv, dtype=np.float32)
                if self.dataset == "dtu":
                    root = os.path.dirname(self.datapath.rstrip("/"))
                    mask_p = os.path.join(root, f"Depths_raw/{scan}/depth_visual_{vid:0>4}.png")
                    depth_p = os.path.join(root, f"Depths_raw/{scan}/depth_map_{vid:0>4}.pfm")
                    if os.path.exists(mask_p) and os.path.exists(depth_p):
                        m = cv2.imread(mask_p, cv2.IMREAD_GRAYSCALE)
                        gt_mask = cv2.resize(
                            (m > 10).astype(np.float32), (self.max_w, self.max_h),
                            interpolation=cv2.INTER_NEAREST)
                        d = np.asarray(read_pfm(depth_p)[0], np.float32)
                        gt_depth = cv2.resize(
                            d, (self.max_w, self.max_h), interpolation=cv2.INTER_NEAREST)

        proj_stack = np.stack(projs)  # intrinsics are K_input/4 here

        def scaled(f):
            p = proj_stack.copy()
            p[:, 1, :2, :] = proj_stack[:, 1, :2, :] * f
            return p

        if self.iterative:
            proj_ms = {
                "stage1": scaled(0.25),
                "stage2": scaled(0.5),
                "stage3": scaled(1.0),
                "stage4": scaled(2.0),
            }
            if self.refine:
                proj_ms["stage5"] = scaled(4.0)
        else:
            proj_ms = {
                "stage1": scaled(0.5),  # K/8 of the resized input
                "stage2": scaled(1.0),  # K/4
                "stage3": scaled(2.0),  # K/2
                "stage4": scaled(4.0),  # K
            }
            if self.refine:
                proj_ms["stage5"] = scaled(4.0)

        sample = {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": proj_ms,
            "depth_values": depth_values[: self.ndepths],
            "filename": scan + "/{}/" + f"{ref:0>8}" + "{}",
        }
        if gt_depth is not None:
            sample["depth_gt"] = gt_depth
            sample["mask"] = gt_mask
        return sample
