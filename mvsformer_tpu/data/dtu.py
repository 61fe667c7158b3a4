"""DTU training/validation dataset (multi-scale + fixed-scale).

Functional spec: /root/reference/datasets/dtu_dataset_ms.py (multi-scale
barrel batching, random resize/crop with valid-mask retry, shared-per-sample
color jitter, per-stage depth/mask pyramids and intrinsics) and
dtu_dataset.py (fixed-scale legacy path). Pure numpy — no torch.

TPU-first notes: the 25 crop sizes become static XLA compilation buckets; a
batch always shares one crop size (the barrel mapping), so the jitted train
step compiles once per (crop_h, crop_w) bucket. Samples are returned NHWC.
"""

from __future__ import annotations

import os

import numpy as np

from mvsformer_tpu.data.augment import JitterParams, apply_jitter, normalize
from mvsformer_tpu.utils.cams import read_cam_file, read_pair_file
from mvsformer_tpu.utils.pfm import read_pfm

STAGE_SCALES = {"stage1": 8, "stage2": 4, "stage3": 2, "stage4": 1}


def stage_pyramid(arr: np.ndarray, interp_nearest=True) -> dict:
    """Per-stage nearest-resize pyramid (dtu_dataset_ms.py:173-181)."""
    import cv2

    h, w = arr.shape[:2]
    out = {}
    for key, s in STAGE_SCALES.items():
        if s == 1:
            out[key] = arr
        else:
            out[key] = cv2.resize(arr, (w // s, h // s), interpolation=cv2.INTER_NEAREST)
    return out


def stage_proj_matrices(proj: np.ndarray) -> dict:
    """Scale intrinsics rows 0:2 by 1/8..1 per stage (dtu_dataset_ms.py:354-367).

    proj: [V, 2, 4, 4] full-resolution camera stacks.
    """
    out = {}
    for key, s in STAGE_SCALES.items():
        p = proj.copy()
        p[:, 1, :2, :] = proj[:, 1, :2, :] / s
        out[key] = p
    return out


class DTUMVSDataset:
    """Map-style dataset; `__getitem__` returns the training sample dict
    {imgs [V,H,W,3], proj_matrices {stageK: [V,2,4,4]}, depth {stageK},
    mask {stageK}, depth_values [D], filename}."""

    BASE_H, BASE_W = 1200, 1600  # original DTU rectified resolution
    MIN_RESIZE = 0.45

    def __init__(self, datapath, listfile, mode, nviews, ndepths=192,
                 interval_scale=1.06, crop=False, augment=False, aug_args=None,
                 height=512, width=640, multi_scale=False, multi_scale_args=None,
                 resize_scale=0.5, consist_crop=False, batch_size=4,
                 world_size=1, seed=123, **kwargs):
        self.datapath = datapath
        self.mode = mode
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        self.height, self.width = height, width
        self.crop = crop if mode == "train" else False
        self.augment = augment if mode == "train" else False
        self.aug_args = aug_args or {}
        self.multi_scale = multi_scale
        msa = multi_scale_args or {}
        self.scales = list(msa.get("scales", [[height, width]]))[::-1]
        self.resize_range = msa.get("resize_range", [1.0, 1.2])
        self.resize_scale = resize_scale
        self.consist_crop = consist_crop
        self.batch_size = batch_size
        self.world_size = world_size
        self.rng = np.random.default_rng(seed)
        self.idx_map = None

        if isinstance(listfile, (list, tuple)):
            scans = list(listfile)
        else:
            with open(listfile) as f:
                scans = [line.rstrip() for line in f if line.strip()]
        self.metas = self._build_list(scans)

    def _build_list(self, scans):
        """(scan, light_idx, ref_view, src_views) x 49 views x 7 lights
        (dtu_dataset_ms.py:90-116)."""
        metas = []
        pair_path = os.path.join(self.datapath, "Cameras/pair.txt")
        pairs = read_pair_file(pair_path)
        for scan in scans:
            for ref, srcs in pairs:
                for light in range(7):
                    metas.append((scan, light, ref, list(srcs)))
        return metas

    def __len__(self):
        return len(self.metas)

    def reset_dataset(self, shuffled_idx):
        """Re-barrel: consecutive batch_size samples in the shuffled order share
        one crop-size barrel (dtu_dataset_ms.py:118-133)."""
        self.idx_map = {}
        barrel = 0
        count = 0
        for sid in np.asarray(shuffled_idx).tolist():
            self.idx_map[int(sid)] = barrel
            count += 1
            if count == self.batch_size:
                count = 0
                barrel += 1

    def crop_size_for(self, idx: int):
        if self.mode == "train" and self.multi_scale and self.idx_map is not None:
            return self.scales[self.idx_map[idx] % len(self.scales)]
        return [self.height, self.width]

    # -- file readers -------------------------------------------------------

    def _read_img(self, path):
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def _read_depth(self, path):
        from mvsformer_tpu.data import native

        return native.read_pfm(path)

    def _read_mask(self, path):
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return (img.astype(np.float32) > 10).astype(np.float32)

    # -- geometry-preserving resize / crop ----------------------------------

    @staticmethod
    def pre_resize(img, depth, intrinsics, mask, scale):
        import cv2

        h, w = img.shape[:2]
        nh, nw = int(h * scale), int(w * scale)
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_AREA)
        intrinsics = intrinsics.copy()
        intrinsics[0, :] *= scale
        intrinsics[1, :] *= scale
        if depth is not None:
            depth = cv2.resize(depth, (nw, nh), interpolation=cv2.INTER_NEAREST)
        if mask is not None:
            mask = cv2.resize(mask, (nw, nh), interpolation=cv2.INTER_NEAREST)
        return img, depth, intrinsics, mask

    def final_crop(self, img, depth, intrinsics, mask, ch, cw, oy=None, ox=None):
        h, w = img.shape[:2]
        if oy is None or ox is None:
            if self.crop:
                oy = int(self.rng.integers(0, h - ch + 1))
                ox = int(self.rng.integers(0, w - cw + 1))
            else:
                oy = (h - ch) // 2
                ox = (w - cw) // 2
        img = img[oy:oy + ch, ox:ox + cw]
        intrinsics = intrinsics.copy()
        intrinsics[0, 2] -= ox
        intrinsics[1, 2] -= oy
        depth = depth[oy:oy + ch, ox:ox + cw] if depth is not None else None
        mask = mask[oy:oy + ch, ox:ox + cw] if mask is not None else None
        return img, depth, intrinsics, mask, oy, ox

    # -- sample assembly -----------------------------------------------------

    def file_paths(self, scan, vid, light):
        return {
            "img": os.path.join(
                self.datapath,
                f"DTU_origin/Rectified/{scan}/rect_{vid + 1:0>3}_{light}_r5000.png"),
            "mask": os.path.join(
                self.datapath, f"Depths_raw/{scan}/depth_visual_{vid:0>4}.png"),
            "depth": os.path.join(
                self.datapath, f"Depths_raw/{scan}/depth_map_{vid:0>4}.pfm"),
            "cam": os.path.join(self.datapath, f"Cameras/{vid:0>8}_cam.txt"),
        }

    def __getitem__(self, idx):
        scan, light, ref_view, src_views = self.metas[idx]
        src_views = list(src_views)
        if self.mode == "train":
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
            paths = self.file_paths(scan, vid, light)
            img = self._read_img(paths["img"])
            cam = read_cam_file(paths["cam"], self.interval_scale)
            intrinsics, extrinsics = cam.intrinsic, cam.extrinsic
            depth_hr = mask_hr = None
            if i == 0:
                depth_hr = self._read_depth(paths["depth"])
                mask_hr = self._read_mask(paths["mask"])

            if resize_scale != 1.0:
                img, depth_hr, intrinsics, mask_hr = self.pre_resize(
                    img, depth_hr, intrinsics, mask_hr, resize_scale)

            if i == 0:
                # Retry crops until the stage-1 mask has valid pixels
                # (dtu_dataset_ms.py:310-317).
                for _ in range(64):
                    img_, depth_, intr_, mask_, oy, ox = self.final_crop(
                        img, depth_hr, intrinsics, mask_hr, crop_h, crop_w)
                    m_ms = stage_pyramid(mask_)
                    if self.mode != "train" or np.any(m_ms["stage1"] > 0.0):
                        break
                depth_ms = stage_pyramid(depth_)
                mask_ms = m_ms
                img, intrinsics = img_, intr_
                depth_max = cam.depth_interval * self.ndepths + cam.depth_min
                depth_values = np.arange(
                    cam.depth_min, depth_max, cam.depth_interval, dtype=np.float32)
            else:
                use_oy, use_ox = (oy, ox) if self.consist_crop else (None, None)
                img, _, intrinsics, _, _, _ = self.final_crop(
                    img, None, intrinsics, None, crop_h, crop_w, use_oy, use_ox)

            proj = np.zeros((2, 4, 4), np.float32)
            proj[0] = extrinsics
            proj[1, :3, :3] = intrinsics
            projs.append(proj)

            imgf = img.astype(np.float32) / 255.0
            if jitter is not None:
                imgf = apply_jitter(imgf, jitter)
            imgs.append(normalize(imgf))

        return {
            "imgs": np.stack(imgs).astype(np.float32),  # [V, H, W, 3]
            "proj_matrices": stage_proj_matrices(np.stack(projs)),
            "depth": depth_ms,
            "mask": mask_ms,
            "depth_values": depth_values[: self.ndepths],
            "filename": scan + "/{}/" + f"{view_ids[0]:0>8}" + "{}",
        }
