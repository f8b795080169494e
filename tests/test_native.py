"""Native host runtime (C++ via ctypes) vs cv2/numpy parity."""

import cv2
import numpy as np
import pytest

from das_tpu.datasets import native

RNG = np.random.RandomState(5)

needs_lib = pytest.mark.skipif(not native.available(),
                               reason='libdas_host.so not built')


@needs_lib
def test_normalize_pad_matches_numpy():
    src = RNG.rand(37, 53, 3).astype(np.float32) * 255
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    dst = np.ones((64, 64, 3), np.float32)
    native.normalize_pad_into(src, dst, mean, std, to_rgb=True)

    ref = np.zeros((64, 64, 3), np.float32)
    ref[:37, :53] = (src[..., ::-1] - mean) / std
    np.testing.assert_allclose(dst, ref, atol=1e-4)


@needs_lib
def test_affine_warp_matches_cv2():
    src = RNG.rand(40, 60, 3).astype(np.float32) * 255
    trans = np.array([[0.9, 0.1, 5.0], [-0.05, 1.1, -3.0]], np.float64)
    border = (110.0, 120.0, 130.0)
    ours = native.affine_warp(src, trans, (40, 60), border)
    ref = cv2.warpAffine(src, trans, (60, 40), flags=cv2.INTER_LINEAR,
                         borderValue=border)
    np.testing.assert_allclose(ours, ref, atol=0.5)


@needs_lib
def test_resize_matches_cv2():
    src = RNG.rand(48, 64, 3).astype(np.float32) * 255
    ours = native.resize_bilinear(src, (24, 40))
    ref = cv2.resize(src, (40, 24), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=0.51)
