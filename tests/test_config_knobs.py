"""Kernel-routing knobs live in ModelConfig (formerly MVSTPU_* env vars).

VERDICT r2 #7: six env switches controlled production kernel routing outside
the config system. They are now ModelConfig fields applied at build_model
time (env override optional, read once at import); these tests parametrize
each knob over both values and pin (a) the plumbing reaches the module that
acts on it, and (b) both routings produce the same numerics where they are
supposed to be exact (SmallConv on/off).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvsformer_tpu.config import ModelConfig, load_config
from mvsformer_tpu.models import blocks
from mvsformer_tpu.models.mvsformer import build_model


def _tiny_cfg(**kw):
    cfg = ModelConfig(ndepths=[2, 2, 2, 2], norm_type="GN", **kw)
    cfg.vit_args.drop_path_rate = 0.0
    return cfg


@pytest.mark.parametrize("modes,s1cap", [("s1,deconv", 144), ("", 1)])
def test_smallconv_routing_applied_at_build(modes, s1cap):
    cfg = _tiny_cfg(smallconv_modes=modes, smallconv_s1cap=s1cap)
    try:
        build_model(cfg)
        assert blocks._SMALLCONV_MODES == frozenset(modes.split(","))
        assert blocks._S1_CAP == s1cap
    finally:
        blocks.configure_smallconv()  # restore defaults for later tests


@pytest.mark.parametrize("flag", [True, False])
def test_corr_bf16_reaches_stagenet(flag):
    # setup() fields are only visible inside init/apply, so probe via
    # nn.apply over the bound module (no params needed to read the field).
    import flax.linen as nn

    model = build_model(_tiny_cfg(corr_bf16=flag))

    def read(m):
        return [f.corr_bf16 for f in m.fusions]

    flags = nn.apply(read, model)({})
    assert flags and all(v == flag for v in flags)


def test_warp_rows_applied_at_build():
    """ModelConfig.warp_rows reaches the kernel module global (VERDICT r3
    #8: the last env knob outside config)."""
    from mvsformer_tpu.ops.pallas import warp_corr

    from mvsformer_tpu.config import ModelConfig

    default_rows = ModelConfig().warp_rows
    prev = warp_corr.ROWS
    try:
        build_model(_tiny_cfg(warp_rows=default_rows * 2))
        assert warp_corr.ROWS == default_rows * 2
    finally:
        warp_corr.ROWS = prev
        build_model(_tiny_cfg())
        assert warp_corr.ROWS == default_rows


def test_smallconv_on_off_numerics_identical():
    """Routing through SmallConv vs nn.Conv is numerically exact and
    param-tree transparent — flipping the config knob must not change
    outputs (this is what makes it checkpoint-safe)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8), jnp.float32)

    def run(modes):
        blocks.configure_smallconv(modes, 144)
        mod = blocks.ConvNormAct(8, norm="GN", dtype=jnp.float32)
        params = mod.init(jax.random.PRNGKey(1), x, False)
        return params, mod.apply(params, x, False)

    try:
        p_on, y_on = run("s1,deconv")
        p_off, y_off = run("")
        assert jax.tree.map(lambda a: (a.shape, str(a.dtype)), p_on) == \
            jax.tree.map(lambda a: (a.shape, str(a.dtype)), p_off)
        y_off2 = blocks.ConvNormAct(8, norm="GN", dtype=jnp.float32).apply(
            p_on, x, False)  # off-routing consumes on-routing's tree
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off2),
                                   rtol=1e-5, atol=1e-5)
    finally:
        blocks.configure_smallconv()


@pytest.mark.parametrize("fused_vis", [True, False])
def test_fused_vis_plumbs_to_visibility_net(fused_vis):
    cfg = _tiny_cfg(fused_vis=fused_vis)
    bound = build_model(cfg).bind({"params": {}})  # runs setup, no compute
    # StageNet field carries the knob for every cascade stage.
    assert all(s.fused_vis is fused_vis for s in bound.fusions)


@pytest.mark.parametrize("fused_fpn", [True, False])
def test_fused_fpn_plumbs_to_decoder(fused_fpn):
    cfg = _tiny_cfg(fused_fpn=fused_fpn)
    bound = build_model(cfg).bind({"params": {}})
    assert bound.decoder.use_fused_level is fused_fpn


@pytest.mark.parametrize("use_fused", [True, False])
def test_visibility_net_both_values_run_on_cpu(use_fused):
    """On CPU the kernel gate always falls back to the flax path; both knob
    values must produce identical results (the knob only matters on TPU)."""
    from mvsformer_tpu.models.stagenet import VisibilityNet

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 1), jnp.float32)
    net = VisibilityNet(norm="GN", dtype=jnp.float32, use_fused=use_fused)
    params = net.init(jax.random.PRNGKey(1), x)
    y = net.apply(params, x)
    assert y.shape == (1, 16, 16, 1)
    assert bool(jnp.all((y >= 0) & (y <= 1)))


def test_knobs_round_trip_through_config_json(tmp_path):
    from mvsformer_tpu.config import Config, save_config

    cfg = Config()
    cfg.arch.fused_vis = False
    cfg.arch.smallconv_modes = "deconv"
    cfg.arch.smallconv_s1cap = 27
    p = tmp_path / "cfg.json"
    save_config(cfg, str(p))
    back = load_config(str(p))
    assert back.arch.fused_vis is False
    assert back.arch.smallconv_modes == "deconv"
    assert back.arch.smallconv_s1cap == 27
