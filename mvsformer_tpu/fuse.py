"""Phase-2 fusion: filter saved depth maps into a point cloud.

Functional spec: /root/reference/test.py:332-565 — the TTDataset that reloads
phase-1 artifacts (depth pfm, confidence npy, cam txt, image jpg) per
reference view with its top-N source views, then pcd (static) or dpcd
(dynamic) consistency filtering and a single merged PLY per scan. The
consistency math runs device-side in JAX (mvsformer_tpu/ops/fusion.py) —
this also covers the capability of the external fusibile binary
(misc/gipuma.py): same check, no external process.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from mvsformer_tpu.ops import fusion as fusion_ops
from mvsformer_tpu.utils.cams import read_cam_file, read_pair_file
from mvsformer_tpu.utils.pfm import read_pfm
from mvsformer_tpu.utils.ply import write_ply


class FusionDataset:
    """Reloads phase-1 outputs per reference view (test.py:332-401 TTDataset)."""

    def __init__(self, pair_folder, scan_folder, n_src_views=10):
        self.scan_folder = scan_folder
        self.pairs = [
            (ref, srcs[:n_src_views])
            for ref, srcs in read_pair_file(os.path.join(pair_folder, "pair.txt"))
            if len(srcs) > 0
        ]

    def __len__(self):
        return len(self.pairs)

    def _load_view(self, vid):
        from mvsformer_tpu.data import native

        depth = native.read_pfm(
            os.path.join(self.scan_folder, "depth_est", f"{vid:0>8}.pfm"))
        conf = np.load(os.path.join(self.scan_folder, "confidence", f"{vid:0>8}.npy"))
        cam = read_cam_file(os.path.join(self.scan_folder, "cams", f"{vid:0>8}_cam.txt"))
        return depth, conf, cam.stacked()

    def __getitem__(self, idx):
        import cv2

        ref, srcs = self.pairs[idx]
        ref_depth, ref_conf, ref_cam = self._load_view(ref)
        img = cv2.cvtColor(
            cv2.imread(os.path.join(self.scan_folder, "images", f"{ref:0>8}.jpg")),
            cv2.COLOR_BGR2RGB)
        src_depths, src_confs, src_cams = [], [], []
        for s in srcs:
            d, c, cm = self._load_view(s)
            src_depths.append(d)
            src_confs.append(c)
            src_cams.append(cm)
        return {
            "ref_id": ref,
            "ref_depth": ref_depth,
            "ref_conf": ref_conf,
            "ref_cam": ref_cam,
            "ref_img": img,
            "src_depths": np.stack(src_depths),
            "src_confs": np.stack(src_confs),
            "src_cams": np.stack(src_cams),
        }


def fuse_scan(pair_folder, scan_folder, plyfilename, method="pcd",
              prob_threshold=(0.5,), thres_view=5, dist_thresh=1.0,
              rel_diff_thresh=0.01, dist_base=4.0, rel_diff_base=1300.0,
              disp_thresh=0.1, num_consistent=2, n_src_views=10, logger=print):
    """Fuse one scan's depth maps into a PLY point cloud.

    method: 'pcd' (static, test.py:404-472) | 'dpcd' (dynamic,
    test.py:475-549) | 'gipuma' (fusibile-equivalent disparity-space
    consistency, misc/gipuma.py:192-213). Source depths are
    confidence-pre-masked like the reference (src conf below threshold zeroes
    the depth => fails the consistency check).
    """
    ds = FusionDataset(pair_folder, scan_folder, n_src_views)
    prob_threshold = tuple(prob_threshold)

    if method == "pcd":
        fuse_fn = jax.jit(lambda rd, sd, rc, sc, conf: fusion_ops.fuse_pcd(
            rd, sd, rc, sc, conf, prob_threshold, dist_thresh, rel_diff_thresh,
            thres_view))
    elif method == "gipuma":
        fuse_fn = jax.jit(lambda rd, sd, rc, sc, conf: fusion_ops.fuse_gipuma(
            rd, sd, rc, sc, conf, prob_threshold, disp_thresh, num_consistent))
    else:
        fuse_fn = jax.jit(lambda rd, sd, rc, sc, conf: fusion_ops.fuse_dpcd(
            rd, sd, rc, sc, conf, prob_threshold, dist_base, rel_diff_base))

    all_points, all_colors = [], []
    for i in range(len(ds)):
        s = ds[i]
        src_depths = s["src_depths"]
        # pre-mask source depths by their confidence (test.py:414-419)
        for v in range(src_depths.shape[0]):
            c = s["src_confs"][v]
            if c.ndim == 3:
                m = np.ones(c.shape[1:], bool)
                for j, th in enumerate(prob_threshold):
                    m &= c[j] > th
            else:
                m = c > prob_threshold[0]
            src_depths[v] *= m.astype(np.float32)

        mask, fused, points = fuse_fn(
            jnp.asarray(s["ref_depth"][None]),
            jnp.asarray(src_depths[None]),
            jnp.asarray(s["ref_cam"][None]),
            jnp.asarray(s["src_cams"][None]),
            jnp.asarray(s["ref_conf"][None]),
        )
        mask = np.asarray(mask[0])
        points = np.asarray(points[0])
        all_points.append(points[mask])
        all_colors.append(s["ref_img"][mask])
        logger(f"view {s['ref_id']:0>2}: kept {mask.mean():.3f} of pixels")

    points = np.concatenate(all_points, axis=0)
    colors = np.concatenate(all_colors, axis=0)
    write_ply(plyfilename, points, colors)
    logger(f"saved {points.shape[0]} points to {plyfilename}")
    return points.shape[0]
