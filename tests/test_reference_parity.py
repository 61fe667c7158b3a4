"""Full-model numerical parity against the torch reference (VERDICT r1 #4).

Instantiates the reference TwinMVSNet (models/mvsformer_model.py:311-449,
imported from /root/reference with the timm/torchvision/omegaconf shims in
tests/_shims), converts its randomly-initialized state_dict through
convert_full_twin, runs both models on one synthetic batch in eval mode, and
asserts per-stage depth/confidence agreement. This pins the whole conversion
chain: conv/deconv layouts + torch-aligned padding, BN folding, bicubic
rescale, backbone attention, hypothesis scheduling, and the ce temperature
decode."""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests", "_shims"))
REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not available")


def _make_batch(rng, B=1, V=3, H=64, W=64, D=192):
    imgs = rng.standard_normal((B, V, 3, H, W)).astype(np.float32)
    K = np.array([[W * 1.2, 0, W / 2], [0, W * 1.2, H / 2], [0, 0, 1]],
                 np.float32)
    projs = {}
    for s, scale in zip(range(1, 5), (1 / 8, 1 / 4, 1 / 2, 1.0)):
        cams = np.zeros((B, V, 2, 4, 4), np.float32)
        for v in range(V):
            ext = np.eye(4, dtype=np.float32)
            ext[0, 3] = v * 2.0
            cams[:, v, 0] = ext
            cams[:, v, 1, :3, :3] = K * scale
            cams[:, v, 1, 2, 2] = 1.0
            cams[:, v, 1, 3, 3] = 1.0
        projs[f"stage{s}"] = cams
    dv = np.broadcast_to(
        np.linspace(425.0, 900.0, D, dtype=np.float32)[None], (B, D)).copy()
    return imgs, projs, dv


@pytest.mark.slow
def test_twin_full_model_parity():
    sys.path.insert(0, REF)
    try:
        import torch

        from models import mvsformer_model
    finally:
        sys.path.remove(REF)

    args = json.load(open(os.path.join(REF, "configs/config_mvsformer.json"))
                     )["arch"]["args"]
    args["vit_args"]["vit_path"] = ""
    torch.manual_seed(0)
    ref = mvsformer_model.TwinMVSNet(args)
    ref.eval()

    rng = np.random.default_rng(0)
    imgs, projs, dv = _make_batch(rng)
    tmps = [5.0, 5.0, 5.0, 1.0]
    with torch.no_grad():
        out_t = ref(torch.from_numpy(imgs),
                    {k: torch.from_numpy(v) for k, v in projs.items()},
                    torch.from_numpy(dv), tmp=tmps)

    from mvsformer_tpu.config import ModelConfig
    from mvsformer_tpu.models.mvsformer import build_model
    from mvsformer_tpu.utils.convert_weights import convert_full_twin

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = convert_full_twin(sd)

    cfg = ModelConfig()
    cfg.use_fused_warp = False
    model = build_model(cfg, dtype=jnp.float32)

    # Validate converted tree structure == init tree structure.
    imgs_j = jnp.asarray(np.transpose(imgs, (0, 1, 3, 4, 2)))
    projs_j = {k: jnp.asarray(v) for k, v in projs.items()}
    dv_j = jnp.asarray(dv)
    variables = jax.jit(
        lambda k: model.init(k, imgs_j, projs_j, dv_j, training=False)
    )(jax.random.PRNGKey(0))

    def shapes(tree, p=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(shapes(v, p + k + "/"))
            else:
                out[p + k] = tuple(np.shape(v))
        return out

    want_p = shapes(variables["params"])
    got_p = shapes(params)
    assert got_p == want_p, (
        f"param mismatch; missing={sorted(set(want_p) - set(got_p))[:8]} "
        f"extra={sorted(set(got_p) - set(want_p))[:8]} "
        f"shape={[k for k in set(got_p) & set(want_p) if got_p[k] != want_p[k]][:8]}")
    want_s = shapes(variables.get("batch_stats", {}))
    got_s = shapes(batch_stats)
    assert got_s == want_s, (
        f"stats mismatch; missing={sorted(set(want_s) - set(got_s))[:8]} "
        f"extra={sorted(set(got_s) - set(want_s))[:8]}")

    out_j = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
        imgs_j, projs_j, dv_j, training=False, tmp=tmps)

    # Stage-by-stage comparison localizes conversion bugs.
    for s in range(1, 5):
        dt = out_t[f"stage{s}"]["depth"].numpy()
        dj = np.asarray(out_j[f"stage{s}"]["depth"])
        span = float(dv.max() - dv.min())
        err = np.abs(dj - dt) / span
        assert err.max() < 5e-3, (
            f"stage{s} depth rel err max {err.max():.5f} mean {err.mean():.6f}")
    ct = out_t["photometric_confidence"].numpy()
    cj = np.asarray(out_j["photometric_confidence"])
    assert np.abs(cj - ct).max() < 5e-3, np.abs(cj - ct).max()
    rt = out_t["refined_depth"].numpy()
    rj = np.asarray(out_j["refined_depth"])
    assert np.abs(rj - rt).max() / span < 5e-3


@pytest.mark.slow
def test_dino_full_model_parity():
    sys.path.insert(0, REF)
    try:
        import torch

        from models import mvsformer_model
    finally:
        sys.path.remove(REF)

    args = json.load(open(os.path.join(REF, "configs/config_mvsformer-p.json"))
                     )["arch"]["args"]
    args["vit_args"]["vit_path"] = ""
    torch.manual_seed(0)
    ref = mvsformer_model.DINOMVSNet(args)
    ref.eval()

    rng = np.random.default_rng(1)
    imgs, projs, dv = _make_batch(rng)
    tmps = [5.0, 5.0, 5.0, 1.0]
    with torch.no_grad():
        out_t = ref(torch.from_numpy(imgs),
                    {k: torch.from_numpy(v) for k, v in projs.items()},
                    torch.from_numpy(dv), tmp=tmps)

    from mvsformer_tpu.config import ModelConfig, ViTConfig
    from mvsformer_tpu.models.mvsformer import build_model
    from mvsformer_tpu.utils.convert_weights import convert_full_dino

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = convert_full_dino(sd)

    cfg = ModelConfig(model_type="dino", fix=True)
    cfg.use_fused_warp = False
    cfg.vit_args = ViTConfig(twin=False, vit_arch="vit_small", vit_ch=384,
                             out_ch=64)
    model = build_model(cfg, dtype=jnp.float32)

    imgs_j = jnp.asarray(np.transpose(imgs, (0, 1, 3, 4, 2)))
    projs_j = {k: jnp.asarray(v) for k, v in projs.items()}
    dv_j = jnp.asarray(dv)
    variables = jax.jit(
        lambda k: model.init(k, imgs_j, projs_j, dv_j, training=False)
    )(jax.random.PRNGKey(0))

    def shapes(tree, p=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(shapes(v, p + k + "/"))
            else:
                out[p + k] = tuple(np.shape(v))
        return out

    want_p = shapes(variables["params"])
    got_p = shapes(params)
    assert got_p == want_p, (
        f"param mismatch; missing={sorted(set(want_p) - set(got_p))[:8]} "
        f"extra={sorted(set(got_p) - set(want_p))[:8]}")

    out_j = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
        imgs_j, projs_j, dv_j, training=False, tmp=tmps)

    span = float(dv.max() - dv.min())
    for s in range(1, 5):
        dt = out_t[f"stage{s}"]["depth"].numpy()
        dj = np.asarray(out_j[f"stage{s}"]["depth"])
        err = np.abs(dj - dt) / span
        assert err.max() < 5e-3, (
            f"stage{s} depth rel err max {err.max():.5f} mean {err.mean():.6f}")
    ct = out_t["photometric_confidence"].numpy()
    cj = np.asarray(out_j["photometric_confidence"])
    assert np.abs(cj - ct).max() < 5e-3, np.abs(cj - ct).max()


@pytest.mark.slow
def test_twin_multiscale_full_model_parity():
    """multi_scale=True variant: FPNDecoderV2 + TwinDecoderStage4V2
    (module.py:273-302, 415-447)."""
    sys.path.insert(0, REF)
    try:
        import torch

        from models import mvsformer_model
    finally:
        sys.path.remove(REF)

    args = json.load(open(os.path.join(REF, "configs/config_mvsformer.json"))
                     )["arch"]["args"]
    args["vit_args"]["vit_path"] = ""
    args["multi_scale"] = True
    torch.manual_seed(0)
    ref = mvsformer_model.TwinMVSNet(args)
    ref.eval()

    rng = np.random.default_rng(2)
    imgs, projs, dv = _make_batch(rng)
    tmps = [5.0, 5.0, 5.0, 1.0]
    with torch.no_grad():
        out_t = ref(torch.from_numpy(imgs),
                    {k: torch.from_numpy(v) for k, v in projs.items()},
                    torch.from_numpy(dv), tmp=tmps)

    from mvsformer_tpu.config import ModelConfig
    from mvsformer_tpu.models.mvsformer import build_model
    from mvsformer_tpu.utils.convert_weights import convert_full_twin

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = convert_full_twin(sd)

    cfg = ModelConfig(multi_scale=True)
    cfg.use_fused_warp = False
    model = build_model(cfg, dtype=jnp.float32)

    imgs_j = jnp.asarray(np.transpose(imgs, (0, 1, 3, 4, 2)))
    projs_j = {k: jnp.asarray(v) for k, v in projs.items()}
    dv_j = jnp.asarray(dv)
    variables = jax.jit(
        lambda k: model.init(k, imgs_j, projs_j, dv_j, training=False)
    )(jax.random.PRNGKey(0))

    def shapes(tree, p=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(shapes(v, p + k + "/"))
            else:
                out[p + k] = tuple(np.shape(v))
        return out

    want_p = shapes(variables["params"])
    got_p = shapes(params)
    assert got_p == want_p, (
        f"param mismatch; missing={sorted(set(want_p) - set(got_p))[:8]} "
        f"extra={sorted(set(got_p) - set(want_p))[:8]} "
        f"shape={[k for k in set(got_p) & set(want_p) if got_p[k] != want_p[k]][:8]}")

    out_j = model.apply(
        {"params": jax.tree.map(jnp.asarray, params),
         "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
        imgs_j, projs_j, dv_j, training=False, tmp=tmps)

    span = float(dv.max() - dv.min())
    for s in range(1, 5):
        dt = out_t[f"stage{s}"]["depth"].numpy()
        dj = np.asarray(out_j[f"stage{s}"]["depth"])
        err = np.abs(dj - dt) / span
        assert err.max() < 5e-3, (
            f"stage{s} depth rel err max {err.max():.5f} mean {err.mean():.6f}")
