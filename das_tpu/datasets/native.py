"""ctypes bindings for the native host runtime (csrc/das_host.cpp).

Gives the data pipeline fused C++ paths for normalize+pad-into-batch,
affine warp, and bilinear resize, with transparent numpy fallbacks when
the shared library hasn't been built (``bash csrc/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), '..', 'libdas_host.so')
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.das_normalize_pad.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, ctypes.c_int]
    lib.das_affine_warp.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f64p, f32p, ctypes.c_int,
        ctypes.c_int, f32p]
    lib.das_resize_bilinear.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def normalize_pad_into(src: np.ndarray, dst: np.ndarray,
                       mean: np.ndarray, std: np.ndarray,
                       to_rgb: bool = True) -> None:
    """Fused (src - mean)/std [+BGR->RGB] + zero-pad, writing into the
    (PH, PW, 3) float32 batch slot ``dst``."""
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    if lib is None:
        img = src[..., ::-1] if to_rgb else src
        img = (img - mean) / std
        dst[:] = 0
        dst[:img.shape[0], :img.shape[1]] = img
        return
    assert dst.flags['C_CONTIGUOUS'] and dst.dtype == np.float32
    lib.das_normalize_pad(_fp(src), src.shape[0], src.shape[1],
                          _fp(dst), dst.shape[0], dst.shape[1],
                          _fp(mean), _fp(std), int(to_rgb))


def affine_warp(src: np.ndarray, trans: np.ndarray, out_hw,
                border) -> np.ndarray:
    """cv2.warpAffine(INTER_LINEAR, constant border) equivalent."""
    lib = _load()
    oh, ow = out_hw
    src = np.ascontiguousarray(src, np.float32)
    if lib is None:
        import cv2
        return cv2.warpAffine(src, np.asarray(trans, np.float64)[:2],
                              (ow, oh), flags=cv2.INTER_LINEAR,
                              borderValue=tuple(border))
    dst = np.empty((oh, ow, 3), np.float32)
    t = np.ascontiguousarray(np.asarray(trans, np.float64)[:2].reshape(6))
    b = np.ascontiguousarray(border, np.float32)
    lib.das_affine_warp(_fp(src), src.shape[0], src.shape[1],
                        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                        _fp(dst), oh, ow, _fp(b))
    return dst


def resize_bilinear(src: np.ndarray, out_hw) -> np.ndarray:
    """cv2.resize(INTER_LINEAR) equivalent, float32 HWC3."""
    lib = _load()
    oh, ow = out_hw
    src = np.ascontiguousarray(src, np.float32)
    if lib is None:
        import cv2
        return cv2.resize(src, (ow, oh), interpolation=cv2.INTER_LINEAR)
    dst = np.empty((oh, ow, 3), np.float32)
    lib.das_resize_bilinear(_fp(src), src.shape[0], src.shape[1],
                            _fp(dst), oh, ow)
    return dst
