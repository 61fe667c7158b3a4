"""Full two-phase pipeline test: eval dataset -> save_depth artifacts ->
fusion -> PLY (the reference's test.py flow, end to end on synthetic data)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsformer_tpu.fuse import fuse_scan
from mvsformer_tpu.infer import save_depth
from mvsformer_tpu.models.mvsformer import build_model
from mvsformer_tpu.utils.pfm import read_pfm
from mvsformer_tpu.utils.ply import read_ply

from tests.test_data import make_eval_tree
from tests.test_model import tiny_cfg


@pytest.mark.slow
def test_save_depth_multichip_matches_serial(tmp_path):
    """SPMD inference (batch over "data", source views over "view") must
    write byte-identical depth maps to the single-device path."""
    from mvsformer_tpu.parallel.mesh import make_mesh

    root = make_eval_tree(str(tmp_path / "eval"))
    out_serial = str(tmp_path / "out_serial")
    out_spmd = str(tmp_path / "out_spmd")

    cfg = tiny_cfg()
    serial = build_model(cfg, dtype=jnp.float32)
    dummy_imgs = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    dummy_projs = {
        f"stage{i}": jnp.tile(jnp.eye(4)[None, None, None], (1, 2, 2, 1, 1))
        for i in range(1, 5)
    }
    dummy_dv = jnp.asarray(np.linspace(425, 900, 48, dtype=np.float32)[None])
    variables = jax.jit(lambda k: serial.init(
        k, dummy_imgs, dummy_projs, dummy_dv, training=False)
    )(jax.random.PRNGKey(0))
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    save_depth(serial, params, bs, ["scan1"], root, out_serial, num_view=3,
               ndepths=16, interval_scale=1.0, max_h=64, max_w=64,
               dataset="dtu", logger=lambda *a: None)

    mesh = make_mesh(data=2, view=2)
    spmd = build_model(cfg, dtype=jnp.float32, view_axis="view")
    save_depth(spmd, params, bs, ["scan1"], root, out_spmd, num_view=3,
               ndepths=16, interval_scale=1.0, max_h=64, max_w=64,
               dataset="dtu", batch_size=2, mesh=mesh, logger=lambda *a: None)

    for vid in range(3):
        want, _ = read_pfm(
            os.path.join(out_serial, f"scan1/depth_est/{vid:0>8}.pfm"))
        got, _ = read_pfm(
            os.path.join(out_spmd, f"scan1/depth_est/{vid:0>8}.pfm"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4,
                                   err_msg=f"view {vid}")


@pytest.mark.slow
def test_save_depth_and_fuse(tmp_path):
    root = make_eval_tree(str(tmp_path / "eval"))
    outdir = str(tmp_path / "out")

    cfg = tiny_cfg()
    model = build_model(cfg, dtype=jnp.float32)
    dummy_imgs = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    dummy_projs = {
        f"stage{i}": jnp.tile(jnp.eye(4)[None, None, None], (1, 2, 2, 1, 1))
        for i in range(1, 5)
    }
    dummy_dv = jnp.asarray(np.linspace(425, 900, 48, dtype=np.float32)[None])
    variables = jax.jit(lambda k: model.init(
        k, dummy_imgs, dummy_projs, dummy_dv, training=False)
    )(jax.random.PRNGKey(0))

    save_depth(model, variables["params"], variables.get("batch_stats", {}),
               ["scan1"], root, outdir, num_view=3, ndepths=48,
               interval_scale=1.0, max_h=64, max_w=64, dataset="dtu",
               logger=lambda *a: None)

    # Phase-1 artifacts exist and have the right shapes.
    d, _ = read_pfm(os.path.join(outdir, "scan1/depth_est/00000000.pfm"))
    assert d.shape == (64, 64)
    conf = np.load(os.path.join(outdir, "scan1/confidence/00000000.npy"))
    assert conf.shape == (64, 64)
    assert os.path.exists(os.path.join(outdir, "scan1/cams/00000000_cam.txt"))
    assert os.path.exists(os.path.join(outdir, "scan1/images/00000000.jpg"))

    # Phase 2: fuse with loose thresholds (untrained model's depth maps are
    # self-consistent enough at identity-ish geometry to yield points).
    ply = os.path.join(outdir, "scan1.ply")
    n = fuse_scan(os.path.join(root, "scan1"), os.path.join(outdir, "scan1"),
                  ply, method="pcd", prob_threshold=(0.0,), thres_view=2,
                  dist_thresh=100.0, rel_diff_thresh=1.0, n_src_views=4,
                  logger=lambda *a: None)
    assert n > 0
    pts, cols = read_ply(ply)
    assert pts.shape[0] == n
    assert np.isfinite(pts).all()
