"""ctypes bindings for the native I/O core (native/libmvsio.so).

Provides multithreaded C++ implementations of the input pipeline's CPU hot
spots — PFM decode, nearest/area resampling, fused uint8->normalized-float
conversion — with transparent numpy fallbacks when the library isn't built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libmvsio.so")
    if not os.path.exists(path):
        _LIB = False
        return _LIB
    lib = ctypes.CDLL(path)
    lib.mvsio_pfm_dims.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 3
    lib.mvsio_pfm_dims.restype = ctypes.c_int
    lib.mvsio_read_pfm.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
    lib.mvsio_read_pfm.restype = ctypes.c_int
    lib.mvsio_write_pfm.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int, ctypes.c_int]
    lib.mvsio_write_pfm.restype = ctypes.c_int
    lib.mvsio_resize_nearest_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    lib.mvsio_resize_area_u8.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int]
    lib.mvsio_normalize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return bool(_load())


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def read_pfm(path: str) -> np.ndarray:
    lib = _load()
    if not lib:
        from mvsformer_tpu.utils.pfm import read_pfm as py_read

        return np.asarray(py_read(path)[0], np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.mvsio_pfm_dims(path.encode(), ctypes.byref(h), ctypes.byref(w),
                            ctypes.byref(c))
    if rc != 0:
        raise IOError(f"mvsio_pfm_dims({path}) -> {rc}")
    shape = (h.value, w.value) if c.value == 1 else (h.value, w.value, 3)
    out = np.empty(shape, np.float32)
    rc = lib.mvsio_read_pfm(path.encode(), _fptr(out))
    if rc != 0:
        raise IOError(f"mvsio_read_pfm({path}) -> {rc}")
    return out


def write_pfm(path: str, data: np.ndarray) -> None:
    lib = _load()
    if not lib:
        from mvsformer_tpu.utils.pfm import save_pfm

        return save_pfm(path, data)
    data = np.ascontiguousarray(data, np.float32)
    rc = lib.mvsio_write_pfm(path.encode(), _fptr(data), data.shape[0], data.shape[1])
    if rc != 0:
        raise IOError(f"mvsio_write_pfm({path}) -> {rc}")


def resize_nearest(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    if not lib:
        import cv2

        return cv2.resize(src, (ow, oh), interpolation=cv2.INTER_NEAREST)
    src = np.ascontiguousarray(src, np.float32)
    c = 1 if src.ndim == 2 else src.shape[2]
    out = np.empty((oh, ow) if src.ndim == 2 else (oh, ow, c), np.float32)
    lib.mvsio_resize_nearest_f32(_fptr(src), src.shape[0], src.shape[1], c,
                                 _fptr(out), oh, ow)
    return out


def resize_area_u8(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    if not lib:
        import cv2

        return cv2.resize(src, (ow, oh), interpolation=cv2.INTER_AREA)
    src = np.ascontiguousarray(src, np.uint8)
    c = 1 if src.ndim == 2 else src.shape[2]
    out = np.empty((oh, ow) if src.ndim == 2 else (oh, ow, c), np.uint8)
    lib.mvsio_resize_area_u8(_u8ptr(src), src.shape[0], src.shape[1], c,
                             _u8ptr(out), oh, ow)
    return out


def normalize_u8(src: np.ndarray, mean, std) -> np.ndarray:
    """uint8 [H,W,C] -> float32 (x/255 - mean)/std, fused."""
    lib = _load()
    if not lib:
        return ((src.astype(np.float32) / 255.0) - np.asarray(mean, np.float32)) \
            / np.asarray(std, np.float32)
    src = np.ascontiguousarray(src, np.uint8)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty(src.shape, np.float32)
    lib.mvsio_normalize_u8(_u8ptr(src), src.shape[0], src.shape[1], src.shape[2],
                           _fptr(mean), _fptr(std), _fptr(out))
    return out
