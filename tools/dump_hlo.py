"""Dump the optimized HLO of the headline eval forward (bench.py shapes).

The tunneled-TPU backend compiles server-side, so --xla_dump_to never lands
locally; `compiled.as_text()` fetches the optimized module through PJRT
instead. Usage:

    python tools/dump_hlo.py /tmp/eval_opt.hlo [--small] [--train]

--train dumps the full training step (fwd+bwd+adamw at the bench.py train
shape) instead — pair with `tools/trace_attr.py <prof> --hlo <dump>` to pin
hot train fusions/copies to their model seams.
"""

import sys
sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from mvsformer_tpu.config import ModelConfig
from mvsformer_tpu.models.mvsformer import build_model


def main():
    out_path = sys.argv[1]
    small = "--small" in sys.argv
    train = "--train" in sys.argv
    if train:
        B, V, H, W, D = 1, 5, 512, 640, 192  # bench.py --train shape
    elif small:
        B, V, H, W, D = 1, 3, 256, 320, 48
    else:
        B, V, H, W, D = 1, 5, 1152, 1536, 192

    cfg = ModelConfig()
    cfg.use_fused_warp = True  # fused_variant stays the production default
    model = build_model(cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((B, V, H, W, 3)).astype(np.float32))
    K = np.array([[W * 1.4, 0, W / 2], [0, W * 1.4, H / 2], [0, 0, 1]],
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
        projs[f"stage{s}"] = jnp.asarray(cams)
    dv = jnp.asarray(np.broadcast_to(
        np.linspace(425.0, 900.0, D, dtype=np.float32)[None], (B, D)).copy())

    variables = jax.jit(
        lambda k: model.init(k, imgs, projs, dv, training=train))(
        jax.random.PRNGKey(0))

    if train:
        import optax

        from mvsformer_tpu.ops import losses as losses_lib

        gt, mask = {}, {}
        for i, scale in enumerate((8, 4, 2, 1)):
            h, w = H // scale, W // scale
            gt[f"stage{i+1}"] = jnp.asarray(
                np.random.default_rng(1).uniform(430, 890, (B, h, w))
                .astype(np.float32))
            mask[f"stage{i+1}"] = jnp.ones((B, h, w), jnp.float32)
        tx = optax.adamw(1e-3)
        opt_state = jax.jit(tx.init)(variables["params"])

        def loss_fn(params, batch_stats, rngs):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                imgs, projs, dv, training=True, tmp=5.0,
                rngs=rngs, mutable=["batch_stats"])
            loss, _ = losses_lib.total_loss(
                out, gt, mask, dv[:, 1] - dv[:, 0], depth_type=cfg.depth_type,
                dlossw=(0.5, 1.0, 1.5, 2.0), inverse_depth=cfg.inverse_depth)
            return loss, mut["batch_stats"]

        def train_step(params, batch_stats, opt_state, step):
            rngs = {"droppath": jax.random.fold_in(jax.random.PRNGKey(0), step)}
            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, rngs)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, bs, opt_state, loss

        lowered = jax.jit(train_step).lower(
            variables["params"], variables.get("batch_stats", {}),
            opt_state, 0)
    else:
        def forward(variables, imgs, projs, dv):
            out = model.apply(variables, imgs, projs, dv, training=False,
                              tmp=5.0)
            return out["refined_depth"], out["photometric_confidence"]

        lowered = jax.jit(forward).lower(variables, imgs, projs, dv)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")


if __name__ == "__main__":
    main()
