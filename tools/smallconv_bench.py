"""Per-shape TPU microbench: nn.Conv/nn.ConvTranspose vs the smallconv paths.

Decides, per conv site in the cascade (see models/blocks.py torch_conv /
torch_deconv routing), whether XLA's conv emitter or the matmul+shift-add
reformulation wins at the REAL eval shapes (1152x1536 DTU). Run on the chip:

    python tools/smallconv_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mvsformer_tpu.ops.smallconv import small_conv, small_conv_transpose


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def bench_conv(name, shape, ks, cout, strides):
    cin = shape[-1]
    x = jnp.asarray(np.random.randn(*shape), jnp.bfloat16)
    k = jnp.asarray(np.random.randn(*ks, cin, cout) * 0.1, jnp.bfloat16)
    pad = tuple(((kk - 1) // 2,) * 2 for kk in ks)
    f_xla = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC") if len(ks) == 2
        else ("NDHWC", "DHWIO", "NDHWC")))
    f_small = jax.jit(lambda x, k: small_conv(x, k, strides=strides))
    ms_x = timeit(f_xla, x, k)
    ms_s = timeit(f_small, x, k)
    win = "SMALL" if ms_s < ms_x else "xla"
    print(f"{name:34s} {str(shape):28s} s={strides} cout={cout:3d} "
          f"xla={ms_x:7.2f}ms small={ms_s:7.2f}ms -> {win}")


def bench_deconv(name, shape, ks, cout, strides, pad):
    cin = shape[-1]
    x = jnp.asarray(np.random.randn(*shape), jnp.bfloat16)
    k = jnp.asarray(np.random.randn(*ks, cin, cout) * 0.1, jnp.bfloat16)
    f_xla = jax.jit(lambda x, k: jax.lax.conv_transpose(
        x, k, strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC") if len(ks) == 2
        else ("NDHWC", "DHWIO", "NDHWC")))
    f_small = jax.jit(lambda x, k: small_conv_transpose(x, k, strides, pad))
    ms_x = timeit(f_xla, x, k)
    ms_s = timeit(f_small, x, k)
    win = "SMALL" if ms_s < ms_x else "xla"
    print(f"{name:34s} {str(shape):28s} s={strides} cout={cout:3d} "
          f"xla={ms_x:7.2f}ms small={ms_s:7.2f}ms -> {win}")


def main():
    print("devices:", jax.devices())
    H, W = 1152, 1536

    # VisibilityNet at stage-4 resolution (per source view)
    bench_conv("vis conv0 1->16", (1, H, W, 1), (3, 3), 16, (1, 1))
    bench_conv("vis conv1 16->16", (1, H, W, 16), (3, 3), 16, (1, 1))
    bench_conv("vis conv2 16->8", (1, H, W, 16), (3, 3), 8, (1, 1))

    # CostRegNet3D stage 4 (D=4) and stage 3 (D=8, half res)
    for D, h, w, tag in [(4, H, W, "s4"), (8, H // 2, W // 2, "s3")]:
        bench_conv(f"{tag} creg conv1 8->16", (1, D, h, w, 8),
                   (3, 3, 3), 16, (1, 2, 2))
        bench_conv(f"{tag} creg conv3 16->32", (1, D, h // 2, w // 2, 16),
                   (3, 3, 3), 32, (1, 2, 2))
        bench_deconv(f"{tag} creg deconv7 64->32",
                     (1, D, h // 8, w // 8, 64), (3, 3, 3), 32,
                     (1, 2, 2), ((1, 1), (1, 2), (1, 2)))
        bench_deconv(f"{tag} creg deconv9 32->16",
                     (1, D, h // 4, w // 4, 32), (3, 3, 3), 16,
                     (1, 2, 2), ((1, 1), (1, 2), (1, 2)))
        bench_deconv(f"{tag} creg deconv11 16->8",
                     (1, D, h // 2, w // 2, 16), (3, 3, 3), 8,
                     (1, 2, 2), ((1, 1), (1, 2), (1, 2)))

    # CostRegNet (D-strided) stage 1/2 shapes: D=32 @ 1/8, D=16 @ 1/4
    bench_conv("s1 creg conv1 8->16", (1, 32, H // 8, W // 8, 8),
               (3, 3, 3), 16, (2, 2, 2))
    bench_deconv("s1 creg deconv11 16->8", (1, 16, H // 16, W // 16, 16),
                 (3, 3, 3), 8, (2, 2, 2), ((1, 2), (1, 2), (1, 2)))
    bench_conv("s2 creg conv1 8->16", (1, 16, H // 4, W // 4, 8),
               (3, 3, 3), 16, (2, 2, 2))
    bench_deconv("s2 creg deconv11 16->8", (1, 8, H // 8, W // 8, 16),
                 (3, 3, 3), 8, (2, 2, 2), ((1, 2), (1, 2), (1, 2)))


if __name__ == "__main__":
    main()
