"""Plane-sweep warp parity tests against torch.grid_sample as the oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from mvsformer_tpu.ops import geometry


def random_cameras(rng, batch):
    """Plausible MVS camera pairs: shared K, small relative rotation/translation."""
    projs = []
    for _ in range(batch):
        K = np.array([[200.0, 0, 32.0], [0, 200.0, 24.0], [0, 0, 1]], np.float32)
        def make(angle, tx):
            c, s = np.cos(angle), np.sin(angle)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            t = np.array([tx, 0.0, 0.0], np.float32)
            P = np.eye(4, dtype=np.float32)
            P[:3, :3] = R
            P[:3, 3] = t
            full = np.eye(4, dtype=np.float32)
            full[:3, :] = K @ P[:3, :]
            return full
        ref = make(0.0, 0.0)
        src = make(rng.uniform(-0.05, 0.05), rng.uniform(-2, 2))
        projs.append((src, ref))
    src = np.stack([p[0] for p in projs])
    ref = np.stack([p[1] for p in projs])
    return src, ref


def torch_warp_oracle(src_fea, src_proj, ref_proj, depth_values):
    """Independent oracle: same math as the reference spec, using torch ops
    (grid_sample is the ground truth for bilinear zero-padded sampling)."""
    src_fea = torch.from_numpy(src_fea)  # [B,C,H,W]
    src_proj = torch.from_numpy(src_proj)
    ref_proj = torch.from_numpy(ref_proj)
    depth_values = torch.from_numpy(depth_values)
    B, C, H, W = src_fea.shape
    D = depth_values.shape[1]

    proj = src_proj @ torch.inverse(ref_proj)
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]
    y, x = torch.meshgrid(
        torch.arange(H, dtype=torch.float32),
        torch.arange(W, dtype=torch.float32),
        indexing="ij",
    )
    xyz = torch.stack((x.reshape(-1), y.reshape(-1), torch.ones(H * W)))
    xyz = xyz.unsqueeze(0).repeat(B, 1, 1)
    rot_xyz = rot @ xyz
    rot_depth_xyz = rot_xyz.unsqueeze(2) * depth_values.view(B, 1, D, -1)
    proj_xyz = rot_depth_xyz + trans.view(B, 3, 1, 1)
    z = proj_xyz[:, 2]
    px = proj_xyz[:, 0] / (z + 1e-6)
    py = proj_xyz[:, 1] / (z + 1e-6)
    gx = px / ((W - 1) / 2) - 1
    gy = py / ((H - 1) / 2) - 1
    grid = torch.stack((gx, gy), dim=3)
    invalid = ((gx.abs() > 1) | (gy.abs() > 1) | (z <= 0)).view(B, D, H, W)
    warped = TF.grid_sample(
        src_fea, grid.view(B, D * H, W, 2), mode="bilinear",
        padding_mode="zeros", align_corners=True,
    ).view(B, C, D, H, W)
    return warped.numpy(), invalid.numpy()


@pytest.mark.parametrize("per_pixel_depth", [False, True])
def test_homo_warp_matches_grid_sample(rng, per_pixel_depth):
    B, C, H, W, D = 2, 8, 48, 64, 6
    src_fea = rng.standard_normal((B, C, H, W), dtype=np.float32)
    src_proj, ref_proj = random_cameras(rng, B)
    if per_pixel_depth:
        base = np.linspace(400, 900, D, dtype=np.float32)
        depth = np.broadcast_to(base[None, :, None, None], (B, D, H, W)).copy()
        depth += rng.uniform(-5, 5, size=depth.shape).astype(np.float32)
    else:
        depth = np.stack([np.linspace(400, 900, D, dtype=np.float32)] * B)

    want, want_mask = torch_warp_oracle(src_fea, src_proj, ref_proj, depth)

    got, got_mask = geometry.homo_warp(
        jnp.asarray(src_fea.transpose(0, 2, 3, 1)),
        jnp.asarray(src_proj),
        jnp.asarray(ref_proj),
        jnp.asarray(depth),
    )
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)  # -> [B,C,D,H,W]

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask)


def test_bilinear_sample_matches_grid_sample(rng):
    B, H, W, C = 2, 20, 30, 4
    src = rng.standard_normal((B, H, W, C), dtype=np.float32)
    # Coordinates straddling in-bounds, edge, and far out-of-bounds.
    px = rng.uniform(-4, W + 3, size=(B, 500)).astype(np.float32)
    py = rng.uniform(-4, H + 3, size=(B, 500)).astype(np.float32)

    got = np.asarray(geometry.bilinear_sample(jnp.asarray(src), jnp.asarray(px), jnp.asarray(py)))

    gx = torch.from_numpy(px) / ((W - 1) / 2) - 1
    gy = torch.from_numpy(py) / ((H - 1) / 2) - 1
    grid = torch.stack([gx, gy], dim=-1).unsqueeze(1)  # [B,1,N,2]
    want = TF.grid_sample(
        torch.from_numpy(src.transpose(0, 3, 1, 2)), grid,
        mode="bilinear", padding_mode="zeros", align_corners=True,
    )[:, :, 0].permute(0, 2, 1).numpy()  # [B,N,C]

    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_compose_projection():
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [1, 2, 3]
    K = np.eye(4, dtype=np.float32)
    K[:3, :3] = [[100, 0, 50], [0, 100, 40], [0, 0, 1]]
    proj = np.stack([ext, K])[None]  # [1,2,4,4]
    got = np.asarray(geometry.compose_projection(jnp.asarray(proj)))[0]
    want = ext.copy()
    want[:3, :] = K[:3, :3] @ ext[:3, :]
    np.testing.assert_allclose(got, want, rtol=1e-6)
