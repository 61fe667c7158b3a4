"""Mini-convergence test: the cascade must LEARN on a synthetic stereo task.

Scene: a fronto-parallel textured plane at depth d seen by a reference camera
and x-translated source cameras — source images are exact subpixel shifts of
the reference by disparity fx*tx/d. A correct warp/correlation/CE pipeline
makes this learnable; the training loss must drop substantially in a few
dozen steps. This catches sign errors, broken gradients, and decode/loss
mismatches that shape tests cannot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mvsformer_tpu.models.mvsformer import build_model
from mvsformer_tpu.ops import geometry, losses

from tests.test_model import tiny_cfg

H = W = 64
FX = 80.0


def smooth_texture(rng, h, w):
    import cv2

    t = rng.standard_normal((h, w, 3)).astype(np.float32)
    t = cv2.GaussianBlur(t, (0, 0), 1.5)
    return (t - t.mean()) / (t.std() + 1e-6)


def make_scene(rng, depth, n_src=2, baseline=2.0):
    """Returns imgs [V,H,W,3], projs {stage}, dv [D], gt depth/mask pyramids."""
    pad = 32
    tex = smooth_texture(rng, H + 2 * pad, W + 2 * pad)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float32)

    imgs = [tex[pad:pad + H, pad:pad + W]]
    cams = [np.eye(4, dtype=np.float32)]
    for v in range(n_src):
        tx = baseline * (v + 1)
        disparity = FX * tx / depth
        # src pixel (x,y) sees the plane point that ref sees at (x + disp).
        xs = np.arange(W, dtype=np.float32) + pad + disparity
        ys = np.arange(H, dtype=np.float32) + pad
        px, py = np.meshgrid(xs, ys)
        sampled = np.asarray(geometry.bilinear_sample(
            jnp.asarray(tex[None]), jnp.asarray(px.reshape(1, -1)),
            jnp.asarray(py.reshape(1, -1)))).reshape(H, W, 3)
        imgs.append(sampled)
        ext = np.eye(4, dtype=np.float32)
        ext[0, 3] = tx
        cams.append(ext)

    projs = {}
    for s, scale in zip(range(1, 5), (1 / 8, 1 / 4, 1 / 2, 1.0)):
        p = np.zeros((len(imgs), 2, 4, 4), np.float32)
        for v, ext in enumerate(cams):
            p[v, 0] = ext
            p[v, 1, :3, :3] = K * scale
            p[v, 1, 2, 2] = 1.0
            p[v, 1, 3, 3] = 1.0
        projs[f"stage{s}"] = p

    dv = np.linspace(40.0, 120.0, 16, dtype=np.float32)
    gt = {f"stage{i+1}": np.full((H // sc, W // sc), depth, np.float32)
          for i, sc in enumerate((8, 4, 2, 1))}
    mask = {k: np.ones_like(v) for k, v in gt.items()}
    return np.stack(imgs), projs, dv, gt, mask


@pytest.mark.slow
def test_loss_decreases_on_planar_scenes():
    rng = np.random.default_rng(0)
    cfg = tiny_cfg(ndepths=[8, 4, 4, 2], norm_type="GN")
    cfg.vit_args.drop_path_rate = 0.0
    model = build_model(cfg, dtype=jnp.float32)

    scenes = [make_scene(rng, depth) for depth in (55.0, 70.0, 90.0, 105.0)]
    batch = {
        "imgs": jnp.asarray(np.stack([s[0] for s in scenes])),
        "projs": jax.tree.map(
            lambda *xs: jnp.asarray(np.stack(xs)), *[s[1] for s in scenes]),
        "dv": jnp.asarray(np.stack([s[2] for s in scenes])),
        "gt": jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *[s[3] for s in scenes]),
        "mask": jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *[s[4] for s in scenes]),
    }

    variables = jax.jit(
        lambda k: model.init(k, batch["imgs"], batch["projs"],
                             batch["dv"], training=False)
    )(jax.random.PRNGKey(0))
    params = variables["params"]
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": {}},
                              batch["imgs"], batch["projs"], batch["dv"],
                              training=True)
            itv = batch["dv"][:, 1] - batch["dv"][:, 0]
            loss, _ = losses.total_loss(out, batch["gt"], batch["mask"], itv,
                                        depth_type="ce")
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for _ in range(24):
        params, opt_state, loss = step(params, opt_state)
        history.append(float(loss))

    early = np.mean(history[:4])
    late = np.mean(history[-4:])
    assert np.isfinite(history).all()
    # Reference trajectory on this task: 5.9 -> 4.3 over 24 steps (ratio
    # ~0.77), continuing to 3.3 by step 40 with predicted depths tracking GT.
    assert late < early * 0.85, f"loss did not learn: {early:.3f} -> {late:.3f}"


@pytest.mark.slow
def test_overfit_reaches_subinterval_depth_accuracy():
    """Stronger than loss-goes-down: overfitting one planar scene must drive
    the EVAL depth map toward ground truth (abs error within a few depth
    intervals) — end-to-end proof that warp geometry, decode, loss, and
    optimizer cooperate to produce metrically correct depth."""
    rng = np.random.default_rng(1)
    cfg = tiny_cfg(ndepths=[8, 4, 4, 2], norm_type="GN")
    cfg.vit_args.drop_path_rate = 0.0
    model = build_model(cfg, dtype=jnp.float32)

    depth_true = 75.0
    imgs, projs, dv, gt, mask = make_scene(rng, depth_true, n_src=2)
    batch = {
        "imgs": jnp.asarray(imgs[None]),
        "projs": jax.tree.map(lambda x: jnp.asarray(x[None]), projs),
        "dv": jnp.asarray(dv[None]),
        "gt": jax.tree.map(lambda x: jnp.asarray(x[None]), gt),
        "mask": jax.tree.map(lambda x: jnp.asarray(x[None]), mask),
    }
    itv = float(dv[1] - dv[0])

    variables = jax.jit(
        lambda k: model.init(k, batch["imgs"], batch["projs"],
                             batch["dv"], training=False)
    )(jax.random.PRNGKey(0))
    params = variables["params"]
    tx = optax.adam(4e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": {}},
                              batch["imgs"], batch["projs"], batch["dv"],
                              training=True)
            loss, _ = losses.total_loss(
                out, batch["gt"], batch["mask"],
                batch["dv"][:, 1] - batch["dv"][:, 0], depth_type="ce")
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_depth(params):
        out = model.apply({"params": params, "batch_stats": {}},
                          batch["imgs"], batch["projs"], batch["dv"],
                          training=False, tmp=[5.0, 5.0, 5.0, 1.0])
        return out["refined_depth"]

    err0 = float(jnp.abs(eval_depth(params) - depth_true).mean())
    best = err0
    for i in range(60):
        params, opt_state, loss = step(params, opt_state)
        if (i + 1) % 10 == 0:
            best = min(best, float(
                jnp.abs(eval_depth(params) - depth_true).mean()))

    assert np.isfinite(best)
    # Measured trajectory on this scene: eval err 68 -> 5.4 by step 20 (~1
    # interval), then rising again as CE memorizes per-pixel bin classes on
    # the single scene (train argmax vs eval soft decode divergence — the
    # multi-scene loss test above guards generalization). Gate the BEST
    # error: the optimization path must pass through a metrically accurate
    # depth solution.
    assert best < 1.5 * itv, f"best error {best:.2f} >= 1.5*interval ({itv:.2f})"
    assert best < 0.15 * err0, f"error never dropped: {err0:.2f} -> best {best:.2f}"
