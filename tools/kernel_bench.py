"""Fused warp+correlation kernel microbenchmark (per cascade-stage shape).

Times the XLA gather path vs fused v1/v2/v3 (+bf16 band) at each DTU-eval
cascade stage shape, one source view — the per-kernel ledger behind
docs/DESIGN.md. Run on a real TPU:

  python tools/kernel_bench.py [--iters 20] [--stages 1,2,3,4]
  python tools/kernel_bench.py --train_bwd   # training fwd+bwd ledger at the
                                             # 512x640 training stage shapes

Prints one line per (stage, impl) with ms/call and the speedup vs XLA.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


# DTU eval 1152x1536, ndepths [32,16,8,4], feat chs [64,32,16,8] at 1/8..1/1.
STAGE_SHAPES = {
    1: (144, 192, 32, 64),
    2: (288, 384, 16, 32),
    3: (576, 768, 8, 16),
    4: (1152, 1536, 4, 8),
}

# DTU training barrel 512x640 (scale_batch_map's largest bucket).
TRAIN_STAGE_SHAPES = {
    1: (64, 80, 32, 64),
    2: (128, 160, 16, 32),
    3: (256, 320, 8, 16),
    4: (512, 640, 4, 8),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--stages", default="1,2,3,4")
    parser.add_argument("--band_rows", type=int, default=12)
    parser.add_argument("--train_bwd", action="store_true",
                        help="benchmark training fwd+grad instead of eval fwd")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from mvsformer_tpu.ops import correlation, geometry
    from mvsformer_tpu.ops.pallas import warp_corr

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    @jax.jit
    def xla_path(ref, src, sp, rp, dv):
        warped, _ = geometry.homo_warp(src, sp, rp, dv)
        return correlation.groupwise_correlation(ref, warped, 8)

    if args.train_bwd:
        # Training ledger: value+grad of a scalar loss through the warp+corr,
        # comparing full-XLA autodiff, kernel-fwd + XLA-recompute bwd, and
        # kernel-fwd + native Pallas bwd.
        from mvsformer_tpu.ops.pallas.warp_corr_train import (
            fused_warp_corr_train,
        )

        def grad_impl(corr_fn):
            def loss(ref, src, sp, rp, dv):
                return (corr_fn(ref, src, sp, rp, dv) ** 2).sum()
            return jax.jit(jax.grad(loss, argnums=(0, 1)))

        impls = {
            "xla": grad_impl(
                lambda ref, src, sp, rp, dv: correlation.groupwise_correlation(
                    ref, geometry.homo_warp(src, sp, rp, dv)[0], 8)),
            "kfwd_xla_bwd": grad_impl(
                lambda ref, src, sp, rp, dv: fused_warp_corr_train(
                    ref, src, sp, rp, dv, 8, args.band_rows, 1, False)),
            "kfwd_kbwd": grad_impl(
                lambda ref, src, sp, rp, dv: fused_warp_corr_train(
                    ref, src, sp, rp, dv, 8, args.band_rows, 1, True)),
        }
        shapes = TRAIN_STAGE_SHAPES
    else:
        shapes = STAGE_SHAPES
        impls = None  # filled below

    impls = impls or {
        "xla": xla_path,
        "v1": lambda ref, src, sp, rp, dv: warp_corr.plane_sweep_group_corr(
            ref, src, sp, rp, dv, groups=8, band_rows=args.band_rows,
            want_invalid=False)[0],
        "v2": lambda ref, src, sp, rp, dv: warp_corr.plane_sweep_group_corr_v2(
            ref, src, sp, rp, dv, groups=8, band_rows=args.band_rows,
            want_invalid=False)[0],
        "v3": lambda ref, src, sp, rp, dv: warp_corr.plane_sweep_group_corr_v3(
            ref, src, sp, rp, dv, groups=8, band_rows=args.band_rows,
            want_invalid=False)[0],
        "v3_bf16": lambda ref, src, sp, rp, dv: warp_corr.plane_sweep_group_corr_v3(
            ref, src, sp, rp, dv, groups=8, band_rows=args.band_rows,
            want_invalid=False, bf16_band=True)[0],
    }

    for stage in (int(s) for s in args.stages.split(",")):
        H, W, D, C = shapes[stage]
        ref = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))
        src = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))
        K = np.array([[W * 1.4, 0, W / 2], [0, W * 1.4, H / 2], [0, 0, 1]],
                     np.float32)
        rp = np.eye(4, dtype=np.float32)[None]
        rp[0, :3, :3] = K
        sp = rp.copy()
        sp[0, 0, 3] = 2.0 * W / 192  # small baseline, scaled with resolution
        rp, sp = jnp.asarray(rp), jnp.asarray(sp)
        dv = jnp.asarray(np.broadcast_to(
            np.linspace(425, 900, D, dtype=np.float32)[None, :, None, None],
            (1, D, H, W)).copy())

        # On the tunneled/experimental TPU platform block_until_ready can
        # return before execution completes (pure dispatch time); a scalar
        # device->host readback is the only reliable completion barrier
        # (same workaround as bench.py's run_once). The tunnel round-trip is
        # ~tens of ms, so it must be paid ONCE per timing window: queue all
        # iters asynchronously (single device stream executes them serially),
        # then barrier on the last output.
        def readback(out):
            leaf = jax.tree.leaves(out)[0]
            return float(jnp.sum(leaf[..., ::8, :]))

        base_ms = None
        for name, fn in impls.items():
            try:
                readback(fn(ref, src, sp, rp, dv))
                t0 = time.perf_counter()
                out = None
                for _ in range(args.iters):
                    out = fn(ref, src, sp, rp, dv)
                readback(out)
                ms = (time.perf_counter() - t0) / args.iters * 1e3
            except Exception as e:
                print(f"stage{stage} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            if name == "xla":
                base_ms = ms
            speed = f" ({base_ms / ms:.2f}x vs xla)" if base_ms and name != "xla" else ""
            print(f"stage{stage} ({H}x{W}, D={D}, C={C}) {name}: "
                  f"{ms:.2f} ms{speed}", flush=True)


if __name__ == "__main__":
    main()
