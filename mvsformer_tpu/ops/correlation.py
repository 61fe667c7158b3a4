"""Group-wise correlation and visibility-weighted cost-volume aggregation.

Functional spec: reference StageNet cost-volume construction
(/root/reference/models/mvsformer_model.py:62-105): per source view, warp the
source features onto the reference plane sweep, compute G-group inner-product
correlation, derive a per-pixel visibility weight (entropy-CNN / epipole
softmax), and accumulate weighted running sums over views. The running sums are
associative reductions, which is exactly what makes the view axis shardable:
under `shard_map` each device accumulates its local views and a single
`psum(volume_sum, vis_sum)` over the "view" mesh axis reproduces the serial
result (see mvsformer_tpu/parallel/).

All correlation math is fp32 (the reference forces an fp32 island via
`autocast(enabled=False)`, mvsformer_model.py:65-68).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def groupwise_correlation(ref_fea: Array, warped: Array, groups: int) -> Array:
    """G-group mean inner product between reference and warped features.

    Args:
      ref_fea: [B, H, W, C] reference features.
      warped:  [B, D, H, W, C] warped source volume.
      groups:  number of correlation groups G (C must divide evenly).

    Returns [B, D, H, W, G] fp32 correlation volume.
    """
    B, D, H, W, C = warped.shape
    ref = ref_fea.astype(jnp.float32).reshape(B, 1, H, W, groups, C // groups)
    src = warped.astype(jnp.float32).reshape(B, D, H, W, groups, C // groups)
    return (ref * src).mean(axis=-1)


def cosine_similarity_volume(ref_fea: Array, warped: Array, groups: int) -> Array:
    """Eval-time cosine-similarity diagnostic volume [B, D, H, W].

    Spec: mvsformer_model.py:81-85 — L2-normalize over the (G, C/G) grouped
    channel axis, mean over within-group channels, sum over groups.
    """
    B, D, H, W, C = warped.shape
    ref = ref_fea.astype(jnp.float32).reshape(B, 1, H, W, groups, C // groups)
    src = warped.astype(jnp.float32).reshape(B, D, H, W, groups, C // groups)
    # Reference normalizes over torch dim=1 of [B, G, C/G, D, H, W] = the group
    # axis with its broadcasted partner; functionally it normalizes the grouped
    # feature vector per (b, c_in_group, d, h, w) across G. Recreate exactly:
    ref_n = ref / (jnp.linalg.norm(ref, axis=-2, keepdims=True) + 1e-12)
    src_n = src / (jnp.linalg.norm(src, axis=-2, keepdims=True) + 1e-12)
    sim = (ref_n * src_n).mean(axis=-1).sum(axis=-1)  # mean C/G, sum G
    return sim


def entropy_over_depth(corr: Array) -> Array:
    """Shannon entropy of the depth-softmaxed similarity, stop-gradient.

    Args:
      corr: [B, D, H, W, G] correlation volume.
    Returns [B, H, W, 1] entropy map (input to the visibility CNN).
    Spec: mvsformer_model.py:88-91.
    """
    sim = corr.sum(axis=-1)  # [B, D, H, W]
    sim = jax.lax.stop_gradient(sim)
    p = jax.nn.softmax(sim, axis=1)
    ent = -(p * jnp.log(p + 1e-7)).sum(axis=1)  # [B, H, W]
    return ent[..., None]


def epipole_weight(corr: Array, attn_temp: Array | float, channels: int) -> Array:
    """Fixed-temperature epipole visibility weight [B, D, H, W].

    Spec: mvsformer_model.py:92-93 (softmax over depth / sqrt(C)).
    """
    score = corr.sum(axis=-1) / attn_temp
    return jax.nn.softmax(score, axis=1) / jnp.sqrt(float(channels))


def epipole_v2_weight(
    corr: Array, attn_temp: Array, invalid: Array, groups: int
) -> Array:
    """Learned-temperature epipole weight with frustum masking [B, D, H, W].

    Spec: mvsformer_model.py:94-97 (clamped temp, -10000 bias on masked bins,
    softmax over depth / sqrt(G)).
    """
    temp = jnp.clip(attn_temp, 0.1, 10.0)
    score = corr.sum(axis=-1) / temp
    score = score + (-10000.0) * invalid.astype(score.dtype)
    return jax.nn.softmax(score, axis=1) / jnp.sqrt(float(groups))
