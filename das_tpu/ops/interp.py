"""Image interpolation / sampling primitives (NHWC, XLA-native).

These replace the torch ops on the reference's hot path with TPU-friendly
formulations:

* ``grid_sample``        — torch ``F.grid_sample(mode='bilinear',
  padding_mode='zeros')`` semantics (ref: recursive_update.py:25,56).
* ``sample_bilinear_abs``— bilinear sampling at absolute pixel coordinates
  (used by the deformable conv and fused decode).
* ``interpolate_bilinear_ac`` — torch ``F.interpolate(align_corners=True)``
  (ref: mspn_mmpose.py:385-389), expressed as two matmuls so it runs on the
  MXU instead of a gather.
* ``upsample_nearest``   — mmdet FPN top-down pathway ``mode='nearest'``.

All functions are shape-polymorphic at trace time and jit-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def sample_bilinear_abs(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                        ) -> jnp.ndarray:
    """Bilinear sample ``img`` (N,H,W,C) at absolute pixel coords.

    ``x``/``y`` have shape (N, ...) broadcastable per-batch sample grids.
    Out-of-bounds contributions are zero (torch ``padding_mode='zeros'``).

    Returns array of shape (N, *x.shape[1:], C).
    """
    N, H, W, C = img.shape
    orig_shape = x.shape
    # coordinates MUST be f32: bf16 has 8 mantissa bits, so at x >= 128
    # the fractional part vanishes and bilinear degrades to nearest
    x = x.reshape(N, -1).astype(jnp.float32)
    y = y.reshape(N, -1).astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    img_flat = img.reshape(N, H * W, C)

    def corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = yi_c * W + xi_c                              # (N, P)
        vals = jnp.take_along_axis(img_flat, flat[..., None], axis=1)
        # weights computed in f32 at (N, P), cast BEFORE the broadcast so
        # the (N, P, C) multiply stays in img.dtype — an f32 weight here
        # silently promotes every gathered map to f32 (2x HBM traffic)
        w = (wgt * inb).astype(img.dtype)
        return vals * w[..., None]

    out = (corner(x0, y0, wx0 * wy0) + corner(x1, y0, wx1 * wy0)
           + corner(x0, y1, wx0 * wy1) + corner(x1, y1, wx1 * wy1))
    return out.reshape(*orig_shape, C)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = False) -> jnp.ndarray:
    """torch-compatible bilinear grid sample, zeros padding.

    Args:
        img:  (N, H, W, C)
        grid: (N, Hg, Wg, 2) — normalized xy in [-1, 1], x first (torch order)
    Returns:
        (N, Hg, Wg, C)
    """
    N, H, W, C = img.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    return sample_bilinear_abs(img, x, y)


@functools.lru_cache(maxsize=64)
def _interp_matrix_ac(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear matrix for align_corners=True resizing."""
    if dst == 1:
        m = np.zeros((1, src), np.float32)
        m[0, 0] = 1.0
        return m
    scale = (src - 1) / (dst - 1)
    pos = np.arange(dst) * scale
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, src - 1)
    hi = np.clip(lo + 1, 0, src - 1)
    w_hi = (pos - lo).astype(np.float32)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), lo] += 1.0 - w_hi
    m[np.arange(dst), hi] += w_hi
    return m


def interpolate_bilinear_ac(x: jnp.ndarray, out_h: int, out_w: int,
                            ) -> jnp.ndarray:
    """Bilinear resize, align_corners=True, NHWC. Runs as two matmuls."""
    N, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x
    mh = jnp.asarray(_interp_matrix_ac(H, out_h))          # (out_h, H)
    mw = jnp.asarray(_interp_matrix_ac(W, out_w))          # (out_w, W)
    x = jnp.einsum('oh,nhwc->nowc', mh, x,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=x.dtype)
    x = jnp.einsum('ow,nhwc->nhoc', mw, x,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=x.dtype)
    return x


def upsample_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour resize to (out_h, out_w), NHWC.

    Matches torch ``F.interpolate(mode='nearest')`` (src = floor(dst*in/out)).
    Fast-path exact integer upscaling via repeat.
    """
    N, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x
    if out_h % H == 0 and out_w % W == 0:
        x = jnp.repeat(x, out_h // H, axis=1)
        x = jnp.repeat(x, out_w // W, axis=2)
        return x
    iy = (np.arange(out_h) * H // out_h).astype(np.int32)
    ix = (np.arange(out_w) * W // out_w).astype(np.int32)
    return x[:, iy][:, :, ix]
