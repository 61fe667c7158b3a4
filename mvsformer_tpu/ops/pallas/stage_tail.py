"""Fused eval-time depth decode (softmax + temperature regression +
confidence) as one Pallas pass over the logit volume.

Spec: ops/regression.decode_depth for depth_type in ("ce", "was") at eval
(ref models/mvsformer_model.py:113-146): depth = sum_d softmax_d(tmp * l)
* dv, confidence = max_d softmax_d(l) = 1 / sum_d exp(l_d - max_d l).

The round-4 verdict prescribed this kernel against the trace's 26.8%
"fusion" bucket; the round-5 reattribution (docs/DESIGN.md) showed that
bucket was actually the FPN levels and the decode itself is already
well-fused by XLA (<2 ms/frame). The kernel is kept because it still
reads the fp32 [B, D, H, W] volume once instead of XLA's 2-3 passes and
removes the [B, D, H, W] dv re-read for the temperature softmax — a small
but real win measured at the frame (see config.fused_stage_tail for the
measured number), and it closes the prescribed deliverable with a ledger
row either way.

Layout: W in lanes (padded to 128), rows in sublanes, the small depth
axis unrolled in-register — the whole per-pixel decode runs in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8


def _kernel(tmp_ref, l_ref, d_ref, depth_ref, conf_ref, *, D: int):
    f32 = jnp.float32
    tmp = tmp_ref[0]
    l = l_ref[0].astype(f32)   # [D, R, W]
    dv = d_ref[0].astype(f32)

    m = l[0]
    for d in range(1, D):
        m = jnp.maximum(m, l[d])
    s1 = jnp.zeros_like(m)
    st = jnp.zeros_like(m)
    ws = jnp.zeros_like(m)
    for d in range(D):
        x = l[d] - m
        s1 = s1 + jnp.exp(x)
        et = jnp.exp(tmp * x)
        st = st + et
        ws = ws + et * dv[d]
    depth_ref[0] = (ws / st).astype(depth_ref.dtype)
    conf_ref[0] = (1.0 / s1).astype(conf_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def fused_depth_decode(logits, depth_values, tmp):
    """(depth [B,H,W] f32, conf [B,H,W] f32) from logits/dv [B,D,H,W] f32.

    Exactly decode_depth for eval ce/was: temperature-softmax soft-argmax
    depth + max-probability confidence, one HBM read of each volume.
    """
    B, D, H, W = logits.shape
    Hp = -(-H // ROWS) * ROWS
    Wp = -(-W // 128) * 128
    if (Hp, Wp) != (H, W):
        pad = ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W))
        logits = jnp.pad(logits, pad)
        depth_values = jnp.pad(depth_values, pad, mode="edge")
    HB = Hp // ROWS

    kernel = functools.partial(_kernel, D=D)
    depth, conf = pl.pallas_call(
        kernel,
        grid=(B, HB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, D, ROWS, Wp), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, ROWS, Wp), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ROWS, Wp), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, Wp), lambda b, h: (b, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(jnp.asarray([tmp], jnp.float32), logits.astype(jnp.float32),
      depth_values.astype(jnp.float32))
    return depth[:, :H, :W], conf[:, :H, :W]
