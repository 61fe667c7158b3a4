"""Fused global-subsampled attention (Twins GSA) in one Pallas pass.

Spec: models/twins.py GlobalSubsampledAttention (reference gvt.py:124-166):
per head, softmax(q @ k^T * hd^-0.5) @ v with spatially-reduced K/V. The XLA
path materializes the fp32 [B, nh, N, Nk] logit matrix plus its softmax
temporaries — at the DTU eval shape the stage-0 block alone is a 477 MB
fp32 tensor crossed ~3x (round-5 trace: vit scope ~16% of device time,
dominated by these chains and the head-split transposes).

Design (tpu-first, no reference counterpart):
- Inputs stay in the model-native [B, N, C] layout — the qkv Dense outputs
  feed the kernel DIRECTLY; the [B, N, nh, hd] head-split transpose and the
  [B, nh, N, Nk] logits never exist in HBM.
- K/V are small (Nk = (H/sr)*(W/sr), 432 at the DTU shape): one VMEM block
  per batch element, revisited across every query tile (the constant index
  map makes Mosaic keep the block resident — no re-DMA).
- Heads are free lane slices of the [rows, C] tiles, unrolled in-register:
  per head one [TQ, hd] x [Nk, hd]^T MXU dot (fp32 accumulation — the XLA
  path rounds logits through bf16; the kernel is strictly tighter), a
  row-softmax in fp32, one [TQ, Nk] x [Nk, hd] dot back.
- Query rows tile at TQ=256 with row padding (padded rows softmax over real
  keys -> finite garbage, sliced off outside); padded key columns are
  masked to -inf before the row max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 256  # query rows per grid step


def _kernel(q_ref, k_ref, v_ref, o_ref, *, nh, hd, nk, scale):
    q = q_ref[0]  # [TQ, C] bf16
    k = k_ref[0]  # [NKp, C] bf16
    v = v_ref[0]
    nkp = k.shape[0]
    key_pad = None
    if nkp != nk:
        key_pad = jax.lax.broadcasted_iota(jnp.int32, (TQ, nkp), 1) >= nk
    outs = []
    for h in range(nh):
        qh = jax.lax.slice_in_dim(q, h * hd, (h + 1) * hd, axis=1)
        kh = jax.lax.slice_in_dim(k, h * hd, (h + 1) * hd, axis=1)
        vh = jax.lax.slice_in_dim(v, h * hd, (h + 1) * hd, axis=1)
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [TQ, NKp]
        if key_pad is not None:
            logits = jnp.where(key_pad, -jnp.inf, logits)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=1, keepdims=True)
        p = (e / s).astype(jnp.bfloat16)
        oh = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [TQ, hd]
        outs.append(oh.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("num_heads",))
def gsa_attention(q, k, v, num_heads: int):
    """q [B, N, C], k/v [B, Nk, C] (contiguous per-head halves of the kv
    Dense output) -> [B, N, C]; exactly the per-head softmax attention of
    GlobalSubsampledAttention, fp32 softmax math."""
    B, N, C = q.shape
    Nk = k.shape[1]
    hd = C // num_heads
    scale = hd ** -0.5

    Np = -(-N // TQ) * TQ
    if Np != N:
        q = jnp.pad(q, ((0, 0), (0, Np - N), (0, 0)))
    NKp = -(-Nk // 8) * 8
    if NKp != Nk:
        k = jnp.pad(k, ((0, 0), (0, NKp - Nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, NKp - Nk), (0, 0)))

    kernel = functools.partial(_kernel, nh=num_heads, hd=hd, nk=Nk,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B, Np // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKp, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKp, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(q, k, v)
    return out[:, :N]
