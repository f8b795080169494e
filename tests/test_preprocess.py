"""On-device preprocessing ops vs cv2 semantics."""

import cv2
import numpy as np

import jax.numpy as jnp

from das_tpu.ops.preprocess import (affine_warp, make_preprocess_fn,
                                    resize_bilinear)

RNG = np.random.RandomState(13)


def test_resize_bilinear_matches_cv2():
    img = RNG.rand(1, 40, 64, 3).astype(np.float32) * 255
    ours = np.asarray(resize_bilinear(jnp.asarray(img), 24, 40))[0]
    ref = cv2.resize(img[0], (40, 24), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=0.51)


def test_preprocess_fn_end_to_end():
    raw = RNG.randint(0, 255, (2, 60, 80, 3)).astype(np.uint8)
    fn = make_preprocess_fn(in_hw=(60, 80), resized_hw=(30, 40),
                            pad_hw=(32, 64))
    out = np.asarray(fn(jnp.asarray(raw)))
    assert out.shape == (2, 32, 64, 3)
    # padding area zero
    np.testing.assert_allclose(out[:, 30:], 0)
    np.testing.assert_allclose(out[:, :, 40:], 0)
    # matches host pipeline on the content area
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    ref = np.stack([cv2.resize(r.astype(np.float32), (40, 30),
                               interpolation=cv2.INTER_LINEAR)
                    for r in raw])
    ref = (ref[..., ::-1] - mean) / std
    np.testing.assert_allclose(out[:, :30, :40], ref, atol=0.05)


def test_affine_warp_matches_cv2():
    img = RNG.rand(1, 40, 60, 3).astype(np.float32) * 255
    trans = np.array([[[0.95, 0.05, 3.0], [-0.02, 1.05, -2.0]]], np.float64)
    border = np.array([100.0, 110.0, 120.0], np.float32)
    ours = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(trans),
                                  40, 60, border))[0]
    ref = cv2.warpAffine(img[0], trans[0], (60, 40),
                         flags=cv2.INTER_LINEAR,
                         borderValue=tuple(border.tolist()))
    np.testing.assert_allclose(ours, ref, atol=0.6)
