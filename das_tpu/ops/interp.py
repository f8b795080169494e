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
                        gather_mode: str = 'clip') -> jnp.ndarray:
    """Bilinear sample ``img`` (N,H,W,C) at absolute pixel coords.

    ``x``/``y`` have shape (N, ...) broadcastable per-batch sample grids.
    Out-of-bounds contributions are zero (torch ``padding_mode='zeros'``).

    ``gather_mode`` picks the XLA gather lowering: indices are pre-clipped
    so ``'clip'`` (no out-of-bounds masking work, unlike the default
    ``'fill'``) is always valid; ``'one_hot'`` reformulates the gather as
    a one-hot matmul on the MXU, which wins for small tables; ``'patch'``
    fetches all four corners as ONE (2,2,C) slice-gather per point —
    gather cost on this backend is per-row, so a quarter of the rows
    (measured 30% faster for the DCN at the stride-8 eval shape).

    Returns array of shape (N, *x.shape[1:], C).
    """
    N, H, W, C = img.shape
    orig_shape = x.shape
    # coordinates MUST be f32: bf16 has 8 mantissa bits, so at x >= 128
    # the fractional part vanishes and bilinear degrades to nearest
    x = x.reshape(N, -1).astype(jnp.float32)
    y = y.reshape(N, -1).astype(jnp.float32)

    if gather_mode == 'patch':
        return _sample_patch(img, x, y).reshape(*orig_shape, C)
    if gather_mode == 'xpack':
        return _sample_xpack(img, x, y).reshape(*orig_shape, C)

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
        vals = jnp.take_along_axis(img_flat, flat[..., None], axis=1,
                                   mode=gather_mode)
        # weights computed in f32 at (N, P), cast BEFORE the broadcast so
        # the (N, P, C) multiply stays in img.dtype — an f32 weight here
        # silently promotes every gathered map to f32 (2x HBM traffic)
        w = (wgt * inb).astype(img.dtype)
        return vals * w[..., None]

    out = (corner(x0, y0, wx0 * wy0) + corner(x1, y0, wx1 * wy0)
           + corner(x0, y1, wx0 * wy1) + corner(x1, y1, wx1 * wy1))
    return out.reshape(*orig_shape, C)


def _sample_patch(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                  ) -> jnp.ndarray:
    """Bilinear sampling via one (2,2,C) slice-gather per point.

    Exact torch ``padding_mode='zeros'`` semantics: per-corner in-bounds
    masks are computed from the UNclipped integer coords, the image is
    zero-padded by 1 so every clipped 2x2 window is a legal slice.

    Args: img (N,H,W,C); x/y (N,P) f32 absolute pixel coords.
    Returns: (N, P, C).
    """
    import jax.lax as lax
    N, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def inb(xi, yi):
        return (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)

    # corner weights with exact zero outside the image
    w00 = wy0 * wx0 * inb(x0, y0)
    w01 = wy0 * wx1 * inb(x0 + 1, y0)
    w10 = wy1 * wx0 * inb(x0, y0 + 1)
    w11 = wy1 * wx1 * inb(x0 + 1, y0 + 1)

    xp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    iy = jnp.clip(y0, -1, H - 1).astype(jnp.int32) + 1      # [0, H]
    ix = jnp.clip(x0, -1, W - 1).astype(jnp.int32) + 1
    idx = jnp.stack([iy, ix], axis=-1)                      # (N, P, 2)
    g = jax.vmap(lambda im, ind: lax.gather(
        im, ind,
        lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(2, 2, C),
        mode='promise_in_bounds'))(xp, idx)                 # (N,P,2,2,C)

    dt = img.dtype
    out = (g[:, :, 0, 0] * w00.astype(dt)[..., None]
           + g[:, :, 0, 1] * w01.astype(dt)[..., None]
           + g[:, :, 1, 0] * w10.astype(dt)[..., None]
           + g[:, :, 1, 1] * w11.astype(dt)[..., None])
    return out


def _sample_xpack(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                  ) -> jnp.ndarray:
    """Bilinear sampling via a (2,1,2C) window gather from an x-packed
    table — the fastest lowering measured for FEW-channel fields.

    The 'patch' (2,2,C) windowed gather is per-row bound and, at C~6
    (the RU offset-sample's [uvd, conf] field), uses 6 of 128 lanes per
    fetch. Packing the two x-neighbours into the channel dim once per
    call (a streaming concat, ~0.45 ms at the level-0 eval shape) makes
    each fetch a (2,1,2C) window: on-chip A/B at the RU's real shape
    (60x160x288x6 table, 480k candidate rows) — patch 9.8 ms,
    packed-24ch row gather 7.8 ms, THIS 6.6 ms, 4x corner row gathers
    18.1 ms. Outputs are bitwise 'patch' (same corner values, same
    weights, same accumulation order; test-pinned).

    Args: img (N,H,W,C); x/y (N,P) f32 absolute pixel coords.
    Returns: (N, P, C).
    """
    import jax.lax as lax
    N, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def inb(xi, yi):
        return (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)

    w00 = wy0 * wx0 * inb(x0, y0)
    w01 = wy0 * wx1 * inb(x0 + 1, y0)
    w10 = wy1 * wx0 * inb(x0, y0 + 1)
    w11 = wy1 * wx1 * inb(x0 + 1, y0 + 1)

    xp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # x-packed: channel block [0:C] = column x, [C:2C] = column x+1
    t = jnp.concatenate([xp[:, :, :-1], xp[:, :, 1:]], axis=-1)
    iy = jnp.clip(y0, -1, H - 1).astype(jnp.int32) + 1      # [0, H]
    ix = jnp.clip(x0, -1, W - 1).astype(jnp.int32) + 1      # [0, W]
    idx = jnp.stack([iy, ix], axis=-1)                      # (N, P, 2)
    g = jax.vmap(lambda im, ind: lax.gather(
        im, ind,
        lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(2, 1, 2 * C),
        mode='promise_in_bounds'))(t, idx)                  # (N,P,2,1,2C)

    dt = img.dtype
    out = (g[:, :, 0, 0, :C] * w00.astype(dt)[..., None]
           + g[:, :, 0, 0, C:] * w01.astype(dt)[..., None]
           + g[:, :, 1, 0, :C] * w10.astype(dt)[..., None]
           + g[:, :, 1, 0, C:] * w11.astype(dt)[..., None])
    return out


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
def _interp_taps_ac(src: int, dst: int):
    """(lo, hi, w_hi) static taps for align_corners=True resizing."""
    if dst == 1:
        return (np.zeros(1, np.int32), np.zeros(1, np.int32),
                np.zeros(1, np.float32))
    scale = (src - 1) / (dst - 1)
    pos = np.arange(dst) * scale
    lo = np.clip(np.floor(pos).astype(np.int32), 0, src - 1)
    hi = np.clip(lo + 1, 0, src - 1)
    w_hi = (pos - lo).astype(np.float32)
    return lo, hi, w_hi


def interpolate_bilinear_ac(x: jnp.ndarray, out_h: int, out_w: int,
                            ) -> jnp.ndarray:
    """Bilinear resize, align_corners=True, NHWC.

    Each output row/col is a 2-tap lerp of input rows/cols at
    compile-time-constant indices: two static takes + a fused multiply-add
    per axis, pure streaming VPU work. (An earlier einsum-matrix
    formulation with ``precision=HIGHEST`` lowered to a ~50x slower
    multi-pass program on the v5e.)
    """
    N, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x

    def lerp_axis(x, axis, src, dst):
        lo, hi, w_hi = _interp_taps_ac(src, dst)
        wshape = [1, 1, 1, 1]
        wshape[axis] = dst
        w = jnp.asarray(w_hi).astype(x.dtype).reshape(wshape)
        xlo = jnp.take(x, jnp.asarray(lo), axis=axis)
        xhi = jnp.take(x, jnp.asarray(hi), axis=axis)
        return xlo + (xhi - xlo) * w

    if H != out_h:
        x = lerp_axis(x, 1, H, out_h)
    if W != out_w:
        x = lerp_axis(x, 2, W, out_w)
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
