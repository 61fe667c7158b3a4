"""Weight-converter tests: a synthetic torch-format state_dict with the
documented key layout must convert into exactly the flax init tree (same
structure, same shapes), and round-trip numerics through known transforms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsformer_tpu.models.dino import vit_small
from mvsformer_tpu.models.twins import alt_gvt_small
from mvsformer_tpu.utils.convert_weights import convert_dino_vit, convert_twins


def synth_twins_sd(rng, embed_dims=(64, 128, 256, 512), heads=(2, 4, 8, 16),
                   depths=(2, 2, 10, 4), sr=(8, 4, 2, 1), patch=4):
    sd = {}
    in_ch = 3
    for i, dim in enumerate(embed_dims):
        p = patch if i == 0 else 2
        sd[f"patch_embeds.{i}.proj.weight"] = rng.standard_normal((dim, in_ch, p, p)).astype(np.float32)
        sd[f"patch_embeds.{i}.proj.bias"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"patch_embeds.{i}.norm.weight"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"patch_embeds.{i}.norm.bias"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"pos_block.{i}.proj.0.weight"] = rng.standard_normal((dim, 1, 3, 3)).astype(np.float32)
        sd[f"pos_block.{i}.proj.0.bias"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"norm_list.{i}.weight"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"norm_list.{i}.bias"] = rng.standard_normal(dim).astype(np.float32)
        for j in range(depths[i]):
            b = f"blocks.{i}.{j}"
            for n in ("norm1", "norm2"):
                sd[f"{b}.{n}.weight"] = rng.standard_normal(dim).astype(np.float32)
                sd[f"{b}.{n}.bias"] = rng.standard_normal(dim).astype(np.float32)
            sd[f"{b}.mlp.fc1.weight"] = rng.standard_normal((dim * 4, dim)).astype(np.float32)
            sd[f"{b}.mlp.fc1.bias"] = rng.standard_normal(dim * 4).astype(np.float32)
            sd[f"{b}.mlp.fc2.weight"] = rng.standard_normal((dim, dim * 4)).astype(np.float32)
            sd[f"{b}.mlp.fc2.bias"] = rng.standard_normal(dim).astype(np.float32)
            if j % 2 == 0:  # windowed attention
                sd[f"{b}.attn.qkv.weight"] = rng.standard_normal((dim * 3, dim)).astype(np.float32)
                sd[f"{b}.attn.qkv.bias"] = rng.standard_normal(dim * 3).astype(np.float32)
            else:  # global subsampled
                sd[f"{b}.attn.q.weight"] = rng.standard_normal((dim, dim)).astype(np.float32)
                sd[f"{b}.attn.q.bias"] = rng.standard_normal(dim).astype(np.float32)
                sd[f"{b}.attn.kv.weight"] = rng.standard_normal((dim * 2, dim)).astype(np.float32)
                sd[f"{b}.attn.kv.bias"] = rng.standard_normal(dim * 2).astype(np.float32)
                if sr[i] > 1:
                    sd[f"{b}.attn.sr.weight"] = rng.standard_normal((dim, dim, sr[i], sr[i])).astype(np.float32)
                    sd[f"{b}.attn.sr.bias"] = rng.standard_normal(dim).astype(np.float32)
                    sd[f"{b}.attn.norm.weight"] = rng.standard_normal(dim).astype(np.float32)
                    sd[f"{b}.attn.norm.bias"] = rng.standard_normal(dim).astype(np.float32)
            sd[f"{b}.attn.proj.weight"] = rng.standard_normal((dim, dim)).astype(np.float32)
            sd[f"{b}.attn.proj.bias"] = rng.standard_normal(dim).astype(np.float32)
        in_ch = dim
    return sd


def tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_shapes(v, prefix + k + "/"))
        else:
            out[prefix + k] = tuple(v.shape)
    return out


def test_twins_conversion_matches_init_tree(rng):
    sd = synth_twins_sd(rng)
    converted = convert_twins(sd)

    model = alt_gvt_small(dtype=jnp.float32)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3))))(jax.random.PRNGKey(0))
    want = tree_shapes(variables["params"])
    got = tree_shapes(converted)
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))[:5]} "
        f"extra: {sorted(set(got) - set(want))[:5]}")

    # Converted tree must run.
    out = model.apply({"params": jax.tree.map(jnp.asarray, converted)},
                      jnp.zeros((1, 64, 64, 3)))
    assert len(out) == 4

    # Spot-check a transform: fc1 kernel is the torch transpose.
    np.testing.assert_array_equal(
        converted["block0_0"]["mlp"]["fc1"]["kernel"],
        sd["blocks.0.0.mlp.fc1.weight"].T)


def synth_dino_sd(rng, dim=384, depth=12, patch=16):
    sd = {
        "cls_token": rng.standard_normal((1, 1, dim)).astype(np.float32),
        "pos_embed": rng.standard_normal((1, 197, dim)).astype(np.float32),
        "patch_embed.proj.weight": rng.standard_normal((dim, 3, patch, patch)).astype(np.float32),
        "patch_embed.proj.bias": rng.standard_normal(dim).astype(np.float32),
        "norm.weight": rng.standard_normal(dim).astype(np.float32),
        "norm.bias": rng.standard_normal(dim).astype(np.float32),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{b}.{n}.weight"] = rng.standard_normal(dim).astype(np.float32)
            sd[f"{b}.{n}.bias"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.standard_normal((dim * 3, dim)).astype(np.float32)
        sd[f"{b}.attn.qkv.bias"] = rng.standard_normal(dim * 3).astype(np.float32)
        sd[f"{b}.attn.proj.weight"] = rng.standard_normal((dim, dim)).astype(np.float32)
        sd[f"{b}.attn.proj.bias"] = rng.standard_normal(dim).astype(np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.standard_normal((dim * 4, dim)).astype(np.float32)
        sd[f"{b}.mlp.fc1.bias"] = rng.standard_normal(dim * 4).astype(np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.standard_normal((dim, dim * 4)).astype(np.float32)
        sd[f"{b}.mlp.fc2.bias"] = rng.standard_normal(dim).astype(np.float32)
    return sd


def test_dino_conversion_matches_init_tree(rng):
    sd = synth_dino_sd(rng)
    converted = convert_dino_vit(sd)

    model = vit_small(dtype=jnp.float32)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3))))(jax.random.PRNGKey(0))
    want = tree_shapes(variables["params"])
    got = tree_shapes(converted)
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))[:5]} "
        f"extra: {sorted(set(got) - set(want))[:5]}")

    tokens, att = model.apply({"params": jax.tree.map(jnp.asarray, converted)},
                              jnp.zeros((1, 64, 64, 3)))
    assert tokens.shape == (1, 1 + 16, 384)
    assert att.shape[1] == 6
