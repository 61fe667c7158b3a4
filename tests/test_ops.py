"""Parity tests for hypothesis schedulers, depth decoding, resize and metrics.

Oracles are independent torch implementations following the reference's
documented semantics (torch's interpolate/avg_pool/cross_entropy are ground
truth for those primitives).
"""

import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from mvsformer_tpu.ops import hypotheses, regression, resize
from mvsformer_tpu.utils import metrics


# ---------------------------------------------------------------- resize

def test_resize_bilinear_align_corners_true(rng):
    x = rng.standard_normal((2, 5, 12, 16), dtype=np.float32)  # [B,C,H,W]
    got = np.asarray(resize.resize_bilinear(jnp.asarray(x), (24, 32), spatial_axes=(2, 3), align_corners=True))
    want = TF.interpolate(torch.from_numpy(x), size=(24, 32), mode="bilinear", align_corners=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_align_corners_false(rng):
    x = rng.standard_normal((2, 5, 12, 16), dtype=np.float32)
    got = np.asarray(resize.resize_bilinear(jnp.asarray(x), (24, 32), spatial_axes=(2, 3), align_corners=False))
    want = TF.interpolate(torch.from_numpy(x), size=(24, 32), mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_nearest(rng):
    x = rng.standard_normal((2, 3, 10, 14), dtype=np.float32)
    got = np.asarray(resize.resize_nearest(jnp.asarray(x), (20, 28), spatial_axes=(2, 3)))
    want = TF.interpolate(torch.from_numpy(x), size=(20, 28), mode="nearest").numpy()
    np.testing.assert_allclose(got, want)


# ------------------------------------------------------------ hypotheses

def test_init_inverse_range(rng):
    B, D, H, W = 2, 8, 6, 7
    depth_values = np.sort(rng.uniform(400, 900, (B, 64)).astype(np.float32), axis=1)
    got = np.asarray(hypotheses.init_inverse_range(jnp.asarray(depth_values), D, H, W))
    inv_min = 1.0 / depth_values[:, 0]
    inv_max = 1.0 / depth_values[:, -1]
    itv = np.arange(D, dtype=np.float32) / (D - 1)
    want = 1.0 / (inv_max[:, None] + (inv_min - inv_max)[:, None] * itv[None])
    want = np.broadcast_to(want[:, :, None, None], (B, D, H, W))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_schedule_inverse_range_matches_torch_trilinear(rng):
    B, Dprev, h, w = 2, 8, 6, 8
    D = 4
    depth = rng.uniform(450, 850, (B, h, w)).astype(np.float32)
    base = np.linspace(400, 900, Dprev, dtype=np.float32)[::-1]  # descending like inverse-depth hypos
    depth_hypo = np.broadcast_to(base[None, :, None, None], (B, Dprev, h, w)).copy()

    got = np.asarray(
        hypotheses.schedule_inverse_range(jnp.asarray(depth), jnp.asarray(depth_hypo), D, 1.5, 2 * h, 2 * w)
    )

    # torch oracle following module.py:642-653 semantics
    td = torch.from_numpy(depth)
    th = torch.from_numpy(depth_hypo)
    last_itv = 1.0 / th[:, 2] - 1.0 / th[:, 1]
    inv_min = 1.0 / td + 1.5 * last_itv
    inv_max = 1.0 / td - 1.5 * last_itv
    itv = torch.arange(D, dtype=torch.float32).reshape(1, -1, 1, 1) / (D - 1)
    inv_hypo = inv_max.unsqueeze(1) + (inv_min - inv_max).unsqueeze(1) * itv
    inv_hypo = TF.interpolate(
        inv_hypo.unsqueeze(1), [D, 2 * h, 2 * w], mode="trilinear", align_corners=True
    ).squeeze(1)
    want = (1.0 / inv_hypo).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_schedule_range_matches_torch(rng):
    B, h, w, D = 2, 6, 8, 8
    depth = rng.uniform(430, 880, (B, h, w)).astype(np.float32)
    itv_pix = rng.uniform(2, 4, (B,)).astype(np.float32)

    got = np.asarray(hypotheses.schedule_range(jnp.asarray(depth), D, jnp.asarray(itv_pix), 2 * h, 2 * w))

    td = torch.from_numpy(depth)
    ti = torch.from_numpy(itv_pix)
    dmin = torch.clamp_min(td - D / 2 * ti[:, None, None], 0.01)
    dmax = td + D / 2 * ti[:, None, None]
    new_itv = (dmax - dmin) / (D - 1)
    samples = dmin.unsqueeze(1) + torch.arange(D, dtype=torch.float32).reshape(1, -1, 1, 1) * new_itv.unsqueeze(1)
    samples = TF.interpolate(samples.unsqueeze(1), [D, 2 * h, 2 * w], mode="trilinear", align_corners=True).squeeze(1)
    np.testing.assert_allclose(got, samples.numpy(), rtol=1e-4, atol=1e-3)


# ------------------------------------------------------------ regression

def test_depth_and_conf_regression(rng):
    B, D, H, W = 2, 16, 6, 8
    logits = rng.standard_normal((B, D, H, W), dtype=np.float32)
    prob = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))
    depth_values = np.sort(rng.uniform(400, 900, (B, D)).astype(np.float32), axis=1)

    got_d = np.asarray(regression.depth_regression(jnp.asarray(prob), jnp.asarray(depth_values)))
    want_d = (prob * depth_values[:, :, None, None]).sum(1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)

    for n in (2, 3, 4):
        got_c = np.asarray(regression.conf_regression(jnp.asarray(prob), n=n))
        # torch oracle (module.py:606-619)
        p = torch.from_numpy(prob)
        if n % 2 == 1:
            s = n * TF.avg_pool3d(TF.pad(p.unsqueeze(1), [0, 0, 0, 0, n // 2, n // 2]), (n, 1, 1), stride=1).squeeze(1)
        else:
            s = n * TF.avg_pool3d(TF.pad(p.unsqueeze(1), [0, 0, 0, 0, n // 2 - 1, n // 2]), (n, 1, 1), stride=1).squeeze(1)
        idx = (p * torch.arange(D, dtype=torch.float32).reshape(1, -1, 1, 1)).sum(1).long().clamp(0, D - 1)
        want_c = torch.gather(s, 1, idx.unsqueeze(1)).squeeze(1).numpy()
        np.testing.assert_allclose(got_c, want_c, rtol=1e-4, atol=1e-5)


def test_argmax_and_mixup_decode(rng):
    B, D, H, W = 2, 8, 5, 6
    logits = rng.standard_normal((B, D, H, W), dtype=np.float32)
    prob = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))
    dv = np.broadcast_to(
        np.linspace(900, 400, D, dtype=np.float32)[None, :, None, None], (B, D, H, W)
    ).copy()

    got = np.asarray(regression.argmax_depth(jnp.asarray(prob), jnp.asarray(dv)))
    idx = prob.argmax(1)
    want = np.take_along_axis(dv, idx[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(got, want)

    got_md, got_mc = regression.mixup_depth(jnp.asarray(prob), jnp.asarray(dv))
    pl, pr = prob[:, :-1], prob[:, 1:]
    mix = pl + pr
    want_mc = mix.max(1)
    midx = mix.argmax(1)
    den = pl + pr + 1e-7
    mixd = dv[:, :-1] * (pl / den) + dv[:, 1:] * (pr / den)
    want_md = np.take_along_axis(mixd, midx[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(np.asarray(got_md), want_md, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mc), want_mc, rtol=1e-5)


# --------------------------------------------------------------- metrics

def test_metrics_match_reference_protocol(rng):
    B, H, W = 3, 10, 12
    est = rng.uniform(400, 900, (B, H, W)).astype(np.float32)
    gt = est + rng.normal(0, 5, (B, H, W)).astype(np.float32)
    mask = rng.uniform(size=(B, H, W)) > 0.3

    got = np.asarray(metrics.thres_metric(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask), 4.0))
    vals = []
    for i in range(B):
        e = np.abs(est[i][mask[i]] - gt[i][mask[i]])
        vals.append((e > 4.0).mean())
    np.testing.assert_allclose(got, np.mean(vals), rtol=1e-5)

    got_abs = np.asarray(metrics.abs_depth_error(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask)))
    vals = [np.abs(est[i][mask[i]] - gt[i][mask[i]]).mean() for i in range(B)]
    np.testing.assert_allclose(got_abs, np.mean(vals), rtol=1e-5)
