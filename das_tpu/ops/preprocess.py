"""Fused on-device test-time preprocessing.

The reference preprocesses on the host (cv2 resize + normalize + pad inside
dataloader workers, SURVEY.md §1). Here the whole chain — uint8 decode
output -> keep-ratio bilinear resize -> BGR->RGB -> normalize -> pad —
compiles into the same XLA program as the model, so only the raw uint8
image crosses PCIe (north-star fused preprocessing).

The bilinear resize uses half-pixel sampling (cv2.INTER_LINEAR semantics)
expressed as two MXU matmuls.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix_halfpixel(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear matrix, half-pixel convention (cv2/jax.image)."""
    scale = src / dst
    pos = (np.arange(dst) + 0.5) * scale - 0.5
    lo = np.floor(pos).astype(np.int64)
    w_hi = (pos - lo).astype(np.float32)
    lo_c = np.clip(lo, 0, src - 1)
    hi_c = np.clip(lo + 1, 0, src - 1)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), lo_c] += 1.0 - w_hi
    m[np.arange(dst), hi_c] += w_hi
    return m


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Half-pixel bilinear resize, NHWC, as two matmuls."""
    N, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x
    mh = jnp.asarray(_interp_matrix_halfpixel(H, out_h))
    mw = jnp.asarray(_interp_matrix_halfpixel(W, out_w))
    x = jnp.einsum('oh,nhwc->nowc', mh, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum('ow,nhwc->nhoc', mw, x,
                   precision=jax.lax.Precision.HIGHEST)
    return x


def make_preprocess_fn(in_hw: Tuple[int, int],
                       resized_hw: Tuple[int, int],
                       pad_hw: Tuple[int, int],
                       mean=(123.675, 116.28, 103.53),
                       std=(58.395, 57.12, 57.375),
                       to_rgb: bool = True):
    """Build a jittable fn: uint8 BGR (N,H,W,3) -> normalized padded fp32.

    ``resized_hw`` is the keep-ratio target; ``pad_hw`` the /32 bucket.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def preprocess(raw: jnp.ndarray) -> jnp.ndarray:
        x = raw.astype(jnp.float32)
        x = resize_bilinear(x, *resized_hw)
        if to_rgb:
            x = x[..., ::-1]
        x = (x - mean) / std
        pad_h = pad_hw[0] - resized_hw[0]
        pad_w = pad_hw[1] - resized_hw[1]
        return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

    return preprocess


def affine_warp(img: jnp.ndarray, trans: jnp.ndarray,
                out_h: int, out_w: int,
                border_value) -> jnp.ndarray:
    """On-device inverse-mapped affine warp (cv2.warpAffine semantics,
    ref transforms_3d.py:986) for device-side train augmentation.

    Args:
        img: (N, H, W, C) float
        trans: (N, 2, 3) forward affine (dst <- src mapping is inverted
               here, matching cv2's behaviour for non-INVERSE_MAP flags)
        border_value: (C,) fill value outside the source image
    """
    from .interp import sample_bilinear_abs

    N, H, W, C = img.shape
    # invert the 2x3 affine per batch
    a = trans[:, :, :2]                                     # (N,2,2)
    b = trans[:, :, 2]                                      # (N,2)
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    inv = jnp.stack([
        jnp.stack([a[:, 1, 1], -a[:, 0, 1]], -1),
        jnp.stack([-a[:, 1, 0], a[:, 0, 0]], -1)], 1) / det[:, None, None]

    xs = jnp.arange(out_w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(out_h, dtype=jnp.float32)[None, :, None]
    dx = jnp.broadcast_to(xs, (N, out_h, out_w)) - b[:, 0, None, None]
    dy = jnp.broadcast_to(ys, (N, out_h, out_w)) - b[:, 1, None, None]
    src_x = inv[:, 0, 0, None, None] * dx + inv[:, 0, 1, None, None] * dy
    src_y = inv[:, 1, 0, None, None] * dx + inv[:, 1, 1, None, None] * dy

    # constant-border bilinear == zeros-padded sampling of (img - border)
    # plus border: out-of-bounds taps contribute exactly the border colour
    border = jnp.asarray(border_value, img.dtype)
    out = sample_bilinear_abs(img - border, src_x, src_y) + border
    return out
