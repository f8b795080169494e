"""Pallas TPU kernel: fused pairwise-OKS + greedy NMS. [EXPERIMENTAL]

The reference runs greedy OKS-NMS as a host-side numpy O(N^2) loop
(ref: mmdet3d/core/post_processing/pose_nms.py:92-126). This kernel builds
the pairwise similarity matrix tile-by-tile in VMEM and runs the greedy
suppression scan on-chip.

STATUS: measured on v5e, the plain XLA formulation
(das_tpu.ops.oks_nms.oks_nms_fixed, 0.66 ms at M=1000) beats this kernel
(~500 ms) — the greedy scan's per-candidate cross-lane scalar reductions
serialize badly in Mosaic. The XLA version is therefore the production
default (core/decode.py); this kernel is kept as a correct, tested
reference point for future blockwise-scan rework.

Mosaic layout rules shape the implementation:
* candidates sit on the sublane axis for row reads (``kpts_rows`` (M, J))
  and on the lane axis for broadcast reads (``kpts_cols`` (J, M)),
* dynamic slices only touch the sublane axis at ROW_TILE-aligned offsets,
* the greedy scan processes ROW_TILE-aligned blocks with the in-block rows
  unrolled statically (scalar VMEM stores are not supported, so keep-mask
  updates are masked full-row writes).

VMEM budget at M=1024, J=15: sim matrix 4 MB + coordinate planes < 6 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 8


def _nms_kernel(xs_rows_ref, ys_rows_ref, xs_cols_ref, ys_cols_ref,
                areas_rows_ref, areas_cols_ref, valid_ref, keep_ref,
                sim_ref, *, num_joints: int, thr: float, variances):
    """Single-program kernel: build sim (M, M), then greedy scan."""
    M = xs_cols_ref.shape[1]

    # ---- pairwise OKS, ROW_TILE rows at a time --------------------------
    eps = np.spacing(1)
    areas_cols = areas_cols_ref[0, :]                        # (M,)

    def sim_tile(t, _):
        r0 = pl.multiple_of(t * ROW_TILE, ROW_TILE)
        x_rows = xs_rows_ref[pl.ds(r0, ROW_TILE), :]         # (T, J)
        y_rows = ys_rows_ref[pl.ds(r0, ROW_TILE), :]
        a_rows = areas_rows_ref[pl.ds(r0, ROW_TILE), :]      # (T, 1)
        scale = (a_rows + areas_cols[None, :]) * 0.5 + eps   # (T, M)
        acc = jnp.zeros((ROW_TILE, M), jnp.float32)
        for k in range(num_joints):
            xk = xs_cols_ref[k, :]                           # (M,)
            yk = ys_cols_ref[k, :]
            d2 = (x_rows[:, k][:, None] - xk[None, :]) ** 2 + \
                 (y_rows[:, k][:, None] - yk[None, :]) ** 2
            acc = acc + jnp.exp(-d2 / (float(variances[k]) * 2.0) / scale)
        sim_ref[pl.ds(r0, ROW_TILE), :] = acc / num_joints
        return 0

    jax.lax.fori_loop(0, M // ROW_TILE, sim_tile, 0)

    # ---- greedy suppression scan ----------------------------------------
    keep_ref[0, :] = jnp.zeros((M,), jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)[0]

    def greedy_block(t, _):
        r0 = pl.multiple_of(t * ROW_TILE, ROW_TILE)
        block = sim_ref[pl.ds(r0, ROW_TILE), :]              # (T, M)
        for j in range(ROW_TILE):
            i = r0 + j
            row = block[j, :]                                # (M,)
            keep = keep_ref[0, :]
            suppressed = ((idx < i) & (keep > 0.5) & (row > thr)).any()
            valid_i = jnp.where(idx == i, valid_ref[0, :], 0.0).max() > 0.5
            ok = jnp.logical_not(suppressed) & valid_i
            keep_ref[0, :] = jnp.where(idx == i, ok.astype(jnp.float32),
                                       keep)
        return 0

    jax.lax.fori_loop(0, M // ROW_TILE, greedy_block, 0)


def oks_nms_pallas(kpts: jnp.ndarray,
                   areas: jnp.ndarray,
                   valid: jnp.ndarray,
                   thr: float,
                   sigmas: np.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """Greedy hard OKS-NMS on TPU via Pallas.

    Args:
        kpts:  (M, J, 2) xy, sorted by score descending
        areas: (M,)
        valid: (M,) bool
    Returns keep mask (M,) bool in the same order.
    """
    M, J, _ = kpts.shape
    pad = (-M) % (ROW_TILE * 16)     # lane-friendly M (multiple of 128)
    if pad:
        kpts = jnp.pad(kpts, ((0, pad), (0, 0), (0, 0)))
        areas = jnp.pad(areas, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    Mp = M + pad

    xs_rows = kpts[..., 0].astype(jnp.float32)               # (Mp, J)
    ys_rows = kpts[..., 1].astype(jnp.float32)
    xs_cols = xs_rows.T                                      # (J, Mp)
    ys_cols = ys_rows.T
    variances = tuple(((np.asarray(sigmas) * 2.0) ** 2).tolist())

    kernel = functools.partial(_nms_kernel, num_joints=J, thr=float(thr),
                               variances=variances)
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Mp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Mp, Mp), jnp.float32)],
        interpret=interpret,
    )(xs_rows, ys_rows, xs_cols, ys_cols,
      areas.astype(jnp.float32)[:, None],
      areas.astype(jnp.float32)[None, :],
      valid.astype(jnp.float32)[None, :])
    return keep[0, :M] > 0.5
