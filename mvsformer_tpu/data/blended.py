"""BlendedMVS training dataset.

Functional spec: /root/reference/datasets/blended_dataset_ms.py — same
multi-scale pipeline as the DTU dataset with BlendedMVS specifics: nested
`{scan}/{scan}/{scan}/{blended_images,cams,rendered_depth_maps}` layout,
per-scan pair.txt, validity mask derived from rendered depth > 0, top-7
source views shuffled at train time, depth interval re-derived from the cam
file's num_depth field, and 2048x1536-base resize clipping (>= 0.375).
"""

from __future__ import annotations

import os

import numpy as np

from mvsformer_tpu.data.dtu import DTUMVSDataset
from mvsformer_tpu.utils.cams import read_pair_file


class BlendedMVSDataset(DTUMVSDataset):
    BASE_H, BASE_W = 1536, 2048
    MIN_RESIZE = 0.375

    def _build_list(self, scans):
        metas = []
        for scan in scans:
            pair_path = os.path.join(self.datapath, scan, scan, scan, "cams/pair.txt")
            for ref, srcs in read_pair_file(pair_path):
                if len(srcs) == 0:
                    continue
                metas.append((scan, 0, ref, list(srcs)))
        return metas

    def file_paths(self, scan, vid, light):
        base = os.path.join(self.datapath, scan, scan, scan)
        return {
            "img": os.path.join(base, f"blended_images/{vid:0>8}.jpg"),
            "depth": os.path.join(base, f"rendered_depth_maps/{vid:0>8}.pfm"),
            "cam": os.path.join(base, f"cams/{vid:0>8}_cam.txt"),
            "mask": None,  # derived from depth > 0
        }

    def _read_mask(self, path):
        raise RuntimeError("BlendedMVS masks are derived from depth")

    def __getitem__(self, idx):
        # Reuse the DTU pipeline with Blended deltas by temporarily patching
        # per-sample pieces is brittle; instead duplicate the small driver.
        import cv2

        from mvsformer_tpu.data.augment import JitterParams, apply_jitter, normalize
        from mvsformer_tpu.data.dtu import stage_proj_matrices, stage_pyramid

        scan, _, ref_view, src_views = self.metas[idx]
        src_views = list(src_views)
        if self.mode == "train":
            src_views = src_views[:7]
            self.rng.shuffle(src_views)
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        jitter = None
        if self.augment:
            jitter = JitterParams.draw(self.rng, **self.aug_args)

        crop_h, crop_w = self.crop_size_for(idx)
        if self.mode == "train":
            enlarge = self.resize_range[0] + self.rng.random() * (
                self.resize_range[1] - self.resize_range[0])
            rs_h = np.clip((crop_h * enlarge) / self.BASE_H, self.MIN_RESIZE, 1.0)
            rs_w = np.clip((crop_w * enlarge) / self.BASE_W, self.MIN_RESIZE, 1.0)
            resize_scale = float(max(rs_h, rs_w))
        else:
            resize_scale = self.resize_scale

        imgs, projs = [], []
        depth_ms = mask_ms = depth_values = None
        oy = ox = None
        for i, vid in enumerate(view_ids):
            paths = self.file_paths(scan, vid, 0)
            img = self._read_img(paths["img"])
            intr, extr, dmin, ditv = self._read_blended_cam(paths["cam"])
            depth_hr = mask_hr = None
            if i == 0:
                depth_hr = self._read_depth(paths["depth"])
                mask_hr = (depth_hr > 0).astype(np.float32)

            if resize_scale != 1.0:
                img, depth_hr, intr, mask_hr = self.pre_resize(
                    img, depth_hr, intr, mask_hr, resize_scale)

            if i == 0:
                for _ in range(64):
                    img_, depth_, intr_, mask_, oy, ox = self.final_crop(
                        img, depth_hr, intr, mask_hr, crop_h, crop_w)
                    m_ms = stage_pyramid(mask_)
                    if self.mode != "train" or np.any(m_ms["stage1"] > 0.0):
                        break
                depth_ms = stage_pyramid(depth_)
                mask_ms = m_ms
                img, intr = img_, intr_
                depth_max = ditv * self.ndepths + dmin
                depth_values = np.arange(dmin, depth_max, ditv, dtype=np.float32)
            else:
                use = (oy, ox) if self.consist_crop else (None, None)
                img, _, intr, _, _, _ = self.final_crop(
                    img, None, intr, None, crop_h, crop_w, *use)

            proj = np.zeros((2, 4, 4), np.float32)
            proj[0] = extr
            proj[1, :3, :3] = intr
            projs.append(proj)

            imgf = img.astype(np.float32) / 255.0
            if jitter is not None:
                imgf = apply_jitter(imgf, jitter)
            imgs.append(normalize(imgf))

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "proj_matrices": stage_proj_matrices(np.stack(projs)),
            "depth": depth_ms,
            "mask": mask_ms,
            "depth_values": depth_values[: self.ndepths],
            "filename": scan + "/{}/" + f"{view_ids[0]:0>8}" + "{}",
        }

    def _read_blended_cam(self, path):
        """Blended cam files re-derive the interval from num_depth
        (blended_dataset_ms.py:143-163)."""
        with open(path) as f:
            lines = [line.rstrip() for line in f]
        extr = np.fromstring(" ".join(lines[1:5]), np.float32, sep=" ").reshape(4, 4)
        intr = np.fromstring(" ".join(lines[7:10]), np.float32, sep=" ").reshape(3, 3)
        fields = lines[11].split()
        dmin = float(fields[0])
        ditv = float(fields[1])
        if len(fields) >= 3:
            dmax = dmin + int(float(fields[2])) * ditv
            ditv = (dmax - dmin) / self.ndepths
        ditv *= self.interval_scale
        return intr, extr, dmin, ditv
