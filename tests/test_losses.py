"""Loss parity tests vs independent torch oracles (reference semantics)."""

import numpy as np
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from mvsformer_tpu.ops import losses


def make_stage(rng, B, D, H, W, inverse=True):
    lo, hi = 425.0, 900.0
    if inverse:
        # Inverse-depth hypotheses are DESCENDING in depth (bin 0 = far plane),
        # matching init_inverse_range's ordering.
        inv = np.linspace(1 / hi, 1 / lo, D, dtype=np.float32)
        base = (1.0 / inv).astype(np.float32)
    else:
        base = np.linspace(lo, hi, D, dtype=np.float32)
    dv = np.broadcast_to(base[None, :, None, None], (B, D, H, W)).copy()
    dv += rng.uniform(-0.5, 0.5, dv.shape).astype(np.float32)
    logits = rng.standard_normal((B, D, H, W), dtype=np.float32)
    return dv, logits


def torch_ce_oracle(dv, logits, gt, mask, inverse):
    dv = torch.from_numpy(dv)
    logits = torch.from_numpy(logits)
    gt = torch.from_numpy(gt).unsqueeze(1)
    mask = (torch.from_numpy(mask) > 0.5).float()
    if inverse:
        dv = torch.flip(dv, dims=[1])
        logits = torch.flip(logits, dims=[1])
    intervals = (dv[:, 1:] - dv[:, :-1]).abs() / 2
    intervals = torch.cat([intervals, intervals[:, -1:]], dim=1)
    min_dv = dv[:, 0:1] - intervals[:, 0:1]
    max_dv = dv[:, -1:] + intervals[:, -1:]
    right = dv + intervals
    out = ((gt < min_dv).float() + (gt > max_dv).float()).clamp(0, 1)
    final_mask = (1 - out).squeeze(1) * mask
    gt_idx = (right <= gt.expand_as(dv)).float().sum(1, keepdims=True).long().clamp(max=dv.shape[1] - 1).squeeze(1)
    fm = final_mask.bool()
    sel_idx = gt_idx[fm]
    sel_logits = logits.permute(0, 2, 3, 1)[fm]
    return TF.cross_entropy(sel_logits, sel_idx, reduction="mean").item()


def test_ce_loss_matches_torch(rng):
    B, D, H, W = 2, 8, 6, 7
    for inverse in (True, False):
        dv, logits = make_stage(rng, B, D, H, W, inverse)
        gt = rng.uniform(400, 930, (B, H, W)).astype(np.float32)  # some out of range
        mask = (rng.uniform(size=(B, H, W)) > 0.2).astype(np.float32)
        outputs = {"stage1": {"depth_values": jnp.asarray(dv), "prob_volume_pre": jnp.asarray(logits)}}
        got = losses.ce_loss_stages(
            outputs, {"stage1": jnp.asarray(gt)}, {"stage1": jnp.asarray(mask)},
            dlossw=(1.0,), inverse_depth=inverse, stage_keys=("stage1",),
        )["stage1"]
        want = torch_ce_oracle(dv, logits, gt, mask, inverse)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_mixup_ce_loss_matches_torch(rng):
    B, D, H, W = 2, 8, 5, 6
    dv, logits = make_stage(rng, B, D, H, W, inverse=True)
    gt = rng.uniform(400, 930, (B, H, W)).astype(np.float32)
    mask = (rng.uniform(size=(B, H, W)) > 0.2).astype(np.float32)

    outputs = {"stage1": {"depth_values": jnp.asarray(dv), "prob_volume_pre": jnp.asarray(logits)}}
    got = losses.mixup_ce_loss_stages(
        outputs, {"stage1": jnp.asarray(gt)}, {"stage1": jnp.asarray(mask)},
        dlossw=(1.0,), inverse_depth=True, stage_keys=("stage1",),
    )["stage1"]

    tdv = torch.flip(torch.from_numpy(dv), dims=[1])
    tl = torch.flip(torch.from_numpy(logits), dims=[1])
    tgt = torch.from_numpy(gt).unsqueeze(1)
    tmask = (torch.from_numpy(mask) > 0.5).float()
    out = ((tgt < tdv[:, 0:1]).float() + (tgt > tdv[:, -1:]).float()).clamp(0, 1)
    fmask = (1 - out).squeeze(1) * tmask
    gt_idx = (tdv[:, 1:] <= tgt.expand_as(tdv[:, :-1])).float().sum(1, keepdims=True).long().clamp(max=D - 2)
    gt_left = torch.gather(tdv[:, :-1], 1, gt_idx)
    itv = torch.gather((tdv[:, 1:] - tdv[:, :-1]).abs(), 1, gt_idx)
    wl = ((tgt - gt_left).abs() / itv).clamp(0, 1).squeeze(1)
    wr = 1 - wl
    ll = TF.cross_entropy(tl[:, :-1], gt_idx.squeeze(1), reduction="none")
    lr_ = TF.cross_entropy(tl[:, 1:], gt_idx.squeeze(1), reduction="none")
    want = ((ll * wl * fmask).sum() / (fmask.sum() + 1e-6) + (lr_ * wr * fmask).sum() / (fmask.sum() + 1e-6)).item()
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_reg_loss_matches_torch(rng):
    B, D, H, W = 2, 8, 5, 6
    dv, _ = make_stage(rng, B, D, H, W, inverse=True)
    est = rng.uniform(400, 900, (B, H, W)).astype(np.float32)
    gt = est + rng.normal(0, 10, (B, H, W)).astype(np.float32)
    mask = (rng.uniform(size=(B, H, W)) > 0.2).astype(np.float32)
    itv = rng.uniform(2, 3, (B,)).astype(np.float32)

    outputs = {"stage1": {"depth": jnp.asarray(est), "depth_values": jnp.asarray(dv)}}
    got = losses.reg_loss_stages(
        outputs, {"stage1": jnp.asarray(gt)}, {"stage1": jnp.asarray(mask)},
        jnp.asarray(itv), dlossw=(1.0,), mask_out_range=True, stage_keys=("stage1",),
    )["stage1"]

    titv = torch.from_numpy(itv).unsqueeze(-1).unsqueeze(-1)
    te = torch.from_numpy(est) / titv
    tg = torch.from_numpy(gt) / titv
    tm = torch.from_numpy(mask) > 0.5
    tdv = torch.flip(torch.from_numpy(dv), dims=[1])
    ints = (tdv[:, 1:] - tdv[:, :-1]).abs() / 2
    ints = torch.cat([ints, ints[:, -1:]], dim=1)
    mn = tdv[:, 0] - ints[:, 0]
    mx = tdv[:, -1] + ints[:, -1]
    tgr = torch.from_numpy(gt)
    oor = ((tgr < mn).float() + (tgr > mx).float()).clamp(0, 1)
    tm = tm & (1 - oor).bool()
    want = TF.smooth_l1_loss(te[tm], tg[tm], reduction="mean").item()
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def torch_sinkhorn_oracle(gt_depth, hypo_depth, attn_weight, mask, iters, eps):
    """Discrete sinkhorn oracle (losses.py:88-134 semantics)."""
    gt_depth = torch.from_numpy(gt_depth)
    hypo_depth = torch.from_numpy(hypo_depth)
    attn_weight = torch.from_numpy(attn_weight)
    mask = torch.from_numpy(mask)
    B, D, H, W = attn_weight.shape
    D_map = torch.stack(
        [torch.arange(-i, D - i, 1, dtype=torch.float32) for i in range(D)], dim=1
    ).abs()
    D_map = D_map[None, None].repeat(B, H * W, 1, 1)
    gt_indices = torch.abs(hypo_depth - gt_depth[:, None]).min(1)[1].reshape(B * H * W, 1)
    gt_dist = torch.zeros(B * H * W, D)
    gt_dist.scatter_add_(1, gt_indices, torch.ones(B * H * W, 1))
    gt_dist = gt_dist.reshape(B, H * W, D)
    pred_dist = attn_weight.permute(0, 2, 3, 1).reshape(B, H * W, D)
    log_mu = (gt_dist + 1e-12).log()
    log_nu = (pred_dist + 1e-12).log()
    u, v = torch.zeros_like(log_nu), torch.zeros_like(log_mu)
    for _ in range(iters):
        v = log_mu - torch.logsumexp(D_map / eps + u.unsqueeze(3), dim=2)
        u = log_nu - torch.logsumexp(D_map / eps + v.unsqueeze(2), dim=3)
    T_map = (D_map / eps + u.unsqueeze(3) + v.unsqueeze(2)).exp()
    loss = (T_map * D_map).reshape(B * H * W, -1)[mask.reshape(-1)].sum(-1).mean()
    return loss.item()


def test_sinkhorn_matches_torch(rng):
    B, D, H, W = 1, 6, 4, 5
    dv, logits = make_stage(rng, B, D, H, W, inverse=True)
    prob = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=1))
    gt = rng.uniform(430, 890, (B, H, W)).astype(np.float32)
    mask = rng.uniform(size=(B, H, W)) > 0.3

    got = losses.sinkhorn_loss(
        jnp.asarray(gt), jnp.asarray(dv), jnp.asarray(prob), jnp.asarray(mask),
        iters=10, eps=1.0, continuous=False,
    )
    want = torch_sinkhorn_oracle(gt, dv, prob, mask, 10, 1.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-3)
