"""Collapsed final FPN level == reference level, values and gradients.

The collapsed path (ops/fpn_collapse.py) pushes the out3 conv through the 2x
align_corners resize and the 1x1 lateral; this pins it against the stock
up2 + MatmulConv1x1 + _OutBlock chain in f32 on CPU, including the zero-padded
borders and the 1x1-bias border field (reference models/module.py:259-268).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsformer_tpu.models.fpn import FPNDecoder


def _rand_feats(rng, n=2, h0=6, w0=8, chs=(8, 16, 32, 64)):
    feats = []
    for lvl, c in enumerate(chs):
        s = 2 ** lvl  # conv01 (8ch) full res ... conv31 (64ch) at 1/8
        feats.append(jnp.asarray(
            rng.standard_normal((n, h0 * 8 // s, w0 * 8 // s, c))
            .astype(np.float32)))
    return tuple(feats)


@pytest.mark.parametrize("training", [False, True])
def test_collapse_matches_reference_level(training):
    rng = np.random.default_rng(0)
    chs = (8, 16, 32, 64)
    c01, c11, c21, c31 = _rand_feats(rng, chs=chs)

    def build(collapse):
        return FPNDecoder(feat_chs=chs, norm="BN", dtype=jnp.float32,
                          collapse_last=collapse)

    ref = build(False)
    variables = ref.init(jax.random.PRNGKey(1), c01, c11, c21, c31,
                         training=False)
    # non-trivial BN stats and biases so the folded-constant terms matter
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.05 * np.float32(1.0), variables)

    kw = dict(training=training)
    if training:
        kw["mutable"] = ["batch_stats"]
        outs_ref = ref.apply(variables, c01, c11, c21, c31, **kw)[0]
        outs_new = build(True).apply(variables, c01, c11, c21, c31, **kw)[0]
    else:
        outs_ref = ref.apply(variables, c01, c11, c21, c31, **kw)
        outs_new = build(True).apply(variables, c01, c11, c21, c31, **kw)

    for i, (a, b) in enumerate(zip(outs_ref, outs_new)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"out{i} mismatch")


def test_collapse_grad_parity():
    """Grads w.r.t. params and inputs agree — the collapsed path reads params
    through self.variables, which must stay differentiable."""
    rng = np.random.default_rng(2)
    chs = (8, 16, 32, 64)
    c01, c11, c21, c31 = _rand_feats(rng, n=1, h0=4, w0=6, chs=chs)

    def build(collapse):
        return FPNDecoder(feat_chs=chs, norm="BN", dtype=jnp.float32,
                          collapse_last=collapse)

    variables = build(False).init(jax.random.PRNGKey(1), c01, c11, c21, c31,
                                  training=False)

    def loss(params, collapse):
        outs, _ = build(collapse).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            c01, c11, c21, c31, training=True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    g_ref = jax.grad(loss)(variables["params"], False)
    g_new = jax.grad(loss)(variables["params"], True)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(g_new))
    assert len(flat_ref) == len(flat_new)
    for path, a in flat_ref:
        b = flat_new[path]
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
