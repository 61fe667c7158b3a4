"""Fused FPN top-down level kernel (ops/pallas/fpn_up.py) vs the flax path.

The kernel replaces FPNDecoder's up2 + lateral-1x1 + residual + 3x3 out conv
+ BN + swish per level at BN inference on TPU. Interpret-mode must agree
with the flax decoder math (same parameter tree) including image borders and
the chained 3-level composition.
"""

import flax
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from mvsformer_tpu.models.fpn import FPNDecoder
from mvsformer_tpu.ops.pallas.fpn_up import (
    fpn_up_level, interleave_h, pack_lateral, pack_prev, phases_to_prev)


def _decoder_variables(rng, shapes, dtype=jnp.float32):
    conv01, conv11, conv21, conv31 = shapes
    dec = FPNDecoder(feat_chs=(8, 16, 32, 64), norm="BN", dtype=dtype)
    args = [jnp.zeros(s, jnp.float32) for s in shapes]
    v = flax.core.unfreeze(dec.init(jax.random.PRNGKey(0), *args, True))

    def rnd(t, s=0.15):
        return jax.tree.map(lambda a: jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32)) * s, t)

    v["params"] = rnd(v["params"])
    v["batch_stats"] = jax.tree.map(
        lambda a: jnp.abs(jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32))) * 0.5 + 0.5,
        v["batch_stats"])
    return dec, v


@pytest.mark.slow
def test_three_level_chain_matches_flax_decoder():
    """Chain the kernel through all three levels and compare out1..out3 and
    out0 against the flax FPNDecoder (CPU platform -> flax path in apply)."""
    rng = np.random.default_rng(0)
    B, H, W = 1, 192, 32  # level-1 hs = H//8 must be >= 24
    shapes = [(B, H, W, 8), (B, H // 2, W // 2, 16),
              (B, H // 4, W // 4, 32), (B, H // 8, W // 8, 64)]
    feats = [jnp.asarray(rng.standard_normal(s).astype(np.float32))
             for s in shapes]
    conv01, conv11, conv21, conv31 = feats
    dec, v = _decoder_variables(rng, shapes)
    ref = dec.apply(v, *feats, False)

    p, bs = v["params"], v["batch_stats"]

    def bn(name):
        bp = p[name]["Norm_0"]["BatchNorm_0"]
        bsn = bs[name]["Norm_0"]["BatchNorm_0"]
        return (bp["scale"], bp["bias"], bsn["mean"], bsn["var"])

    prev = pack_prev(conv31)
    outs = []
    for lvl, lat in enumerate([conv21, conv11, conv01], start=1):
        out_ph, intra_ph = fpn_up_level(
            prev, pack_lateral(lat),
            p[f"inner{lvl}"]["kernel"], p[f"inner{lvl}"]["bias"],
            p[f"out{lvl}"]["Conv_0"]["kernel"],
            p[f"out{lvl}"]["Conv_0"]["bias"],
            bn(f"out{lvl}"), emit_intra=(lvl < 3), interpret=True)
        outs.append(interleave_h(out_ph).astype(jnp.float32))
        if lvl < 3:
            prev = phases_to_prev(intra_ph)

    for got, want, name in zip(outs, ref[1:], ("out1", "out2", "out3")):
        scale = float(jnp.max(jnp.abs(want))) + 1e-6
        err = float(jnp.max(jnp.abs(got - want))) / scale
        assert err < 2e-2, (name, err)


def test_border_rows_zero_pad_semantics():
    """First/last rows exercise the zero-weight borders and the clamped
    band DMA realignment; constant input makes halo bugs visible."""
    rng = np.random.default_rng(1)
    B, H, W = 1, 192, 32
    shapes = [(B, H, W, 8), (B, H // 2, W // 2, 16),
              (B, H // 4, W // 4, 32), (B, H // 8, W // 8, 64)]
    feats = [jnp.ones(s, jnp.float32) for s in shapes]
    dec, v = _decoder_variables(rng, shapes)
    ref = dec.apply(v, *feats, False)

    p, bs = v["params"], v["batch_stats"]

    def bn(name):
        bp = p[name]["Norm_0"]["BatchNorm_0"]
        bsn = bs[name]["Norm_0"]["BatchNorm_0"]
        return (bp["scale"], bp["bias"], bsn["mean"], bsn["var"])

    prev = pack_prev(feats[3])
    out_ph, _ = fpn_up_level(
        prev, pack_lateral(feats[2]),
        p["inner1"]["kernel"], p["inner1"]["bias"],
        p["out1"]["Conv_0"]["kernel"], p["out1"]["Conv_0"]["bias"],
        bn("out1"), emit_intra=False, interpret=True)
    got = interleave_h(out_ph).astype(jnp.float32)
    want = ref[1]
    scale = float(jnp.max(jnp.abs(want))) + 1e-6
    # borders are where halo bugs appear
    err_top = float(jnp.max(jnp.abs(got[:, :3] - want[:, :3]))) / scale
    err_bot = float(jnp.max(jnp.abs(got[:, -3:] - want[:, -3:]))) / scale
    assert err_top < 2e-2 and err_bot < 2e-2, (err_top, err_bot)
