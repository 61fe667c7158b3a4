"""Native I/O core parity tests (C++ libmvsio vs numpy/cv2 references)."""

import numpy as np
import pytest

from mvsformer_tpu.data import native
from mvsformer_tpu.utils.pfm import read_pfm as py_read_pfm, save_pfm


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="libmvsio.so not built")


@needs_native
def test_pfm_roundtrip_native(tmp_path, rng):
    d = rng.standard_normal((37, 53)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    native.write_pfm(p, d)
    np.testing.assert_array_equal(native.read_pfm(p), d)
    # cross-compat with the python codec both ways
    np.testing.assert_array_equal(py_read_pfm(p)[0], d)
    p2 = str(tmp_path / "y.pfm")
    save_pfm(p2, d)
    np.testing.assert_array_equal(native.read_pfm(p2), d)


@needs_native
def test_resize_nearest_matches_cv2(rng):
    import cv2

    src = rng.standard_normal((48, 64)).astype(np.float32)
    got = native.resize_nearest(src, 24, 32)
    want = cv2.resize(src, (32, 24), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_resize_area_close_to_cv2(rng):
    import cv2

    src = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    got = native.resize_area_u8(src, 32, 48)
    want = cv2.resize(src, (48, 32), interpolation=cv2.INTER_AREA)
    # Integer-rounding conventions differ by at most 1 LSB.
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@needs_native
def test_normalize_matches_numpy(rng):
    src = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = native.normalize_u8(src, mean, std)
    want = (src.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
