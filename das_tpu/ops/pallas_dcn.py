"""Fused Pallas TPU kernel for the gather-free DCN shift expansion.

The XLA lowering of the shift expansion (``deform_conv._deform_conv_shift``)
is HBM-bound: XLA materialises per-tap accumulators between fusions, so
the padded feature map is re-read from HBM for (almost) every of the
``K*K * (2r+2)^2`` shifted multiply-adds — measured ~1.1 ms per 2-4-shift
fusion at the 640x1152 eval shape, ~40% of the whole inference step.

This kernel performs the entire DCNv2 shift computation for a band of
output rows in ONE VMEM-resident pass: the halo'd input band is DMA'd
from HBM once, all ``K*K`` taps' hat-function windows read it from VMEM,
and each tap's modulated accumulator feeds the MXU contraction against
its (Cin, Cout) kernel slice. HBM traffic drops to
``read(x + offsets + mask) + write(out)`` — the speed-of-light minimum
for this op.

Semantics: identical to ``_deform_conv_shift`` (offsets clamped to
``[-radius, radius]``; hat weights; zeros padding), except the Cout
accumulation across taps is f32 (the XLA path accumulates the per-tap
einsum results in ``x.dtype``) — pinned vs the XLA path by
``tests/test_ops.py`` at fp tolerance.

ref: /root/reference/mmdet3d/ops (mmcv ModulatedDeformConv semantics);
the shift expansion itself is a das_tpu TPU-native design, see
das_tpu/ops/deform_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_h(h: int) -> int:
    for bh in (4, 2, 5, 1):
        if h % bh == 0:
            return bh
    return 1


def _kernel(off_ref, m_ref, w_ref, xp_hbm, out_ref, band, xsh, out_acc,
            sem, *, K: int, padding: int, radius: int, bh: int, P: int,
            w_dim: int, cin: int, cout: int, dtype):
    n = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * bh

    dma = pltpu.make_async_copy(
        xp_hbm.at[n, pl.ds(r0, bh + 2 * P)], band, sem)
    dma.start()

    off = off_ref[0]                      # (bh, W, 2*K*K) f32
    m = m_ref[0]                          # (bh, W, K*K)
    r = float(radius)
    dma.wait()

    if xsh is not None:
        # pre-shift: every distinct x offset the tap windows will read
        # (slice starts 1..K+2r+1) is materialised ONCE as an aligned
        # (sublane-offset-0) copy, so the K*K*(2r+2)^2 FMA reads below
        # are all layout-aligned. Without this, each read is a
        # sublane-misaligned slice that Mosaic lowers to a rotate+select
        # pass of its own — measured 17.6 -> 13.6 ms (bitwise-equal
        # output) at the level-0 eval shape (B=4 160x288x256, r=1,
        # bh=4), chained best-window.
        for s in range(xsh.shape[0]):
            xsh[s] = band[:, s + 1:s + 1 + w_dim, :]

    out_acc[...] = jnp.zeros((bh * w_dim, cout), jnp.float32)
    for k in range(K * K):
        kh, kw = divmod(k, K)
        dy = jnp.clip(off[..., 2 * k], -r, r) + (kh - padding)
        dx = jnp.clip(off[..., 2 * k + 1], -r, r) + (kw - padding)
        # relayout ONCE per tap into (bh, W, 1) [W on sublane] and build
        # every hat weight there: broadcasting a (bh, W)-lane plane into
        # the (W-sublane, C-lane) accumulator forces a per-shift
        # relayout — 16 of them per tap measured 9x off the VPU roofline
        dy3 = dy[..., None]
        dx3 = dx[..., None]
        acc = jnp.zeros((bh, w_dim, cin), dtype)
        for iy in range(kh - padding - radius,
                        kh - padding + radius + 2):
            wy3 = jnp.maximum(0.0, 1.0 - jnp.abs(iy - dy3))  # (bh,W,1)
            rows = None if xsh is not None \
                else band[iy + P:iy + P + bh]                # (bh,Wp,C)
            for ix in range(kw - padding - radius,
                            kw - padding + radius + 2):
                wgt3 = wy3 * jnp.maximum(0.0, 1.0 - jnp.abs(ix - dx3))
                if xsh is not None:
                    tap = xsh[ix + P - 1, iy + P:iy + P + bh]
                else:
                    tap = rows[:, ix + P:ix + P + w_dim, :]
                acc = acc + tap * wgt3.astype(dtype)
        acc = acc * m[..., k:k + 1].astype(dtype)
        # accumulate through VMEM scratch: full unroll otherwise keeps
        # all 9 taps' f32 partials live and blows the vmem stack budget
        out_acc[...] = out_acc[...] + jnp.dot(
            acc.reshape(bh * w_dim, cin), w_ref[k],
            preferred_element_type=jnp.float32)
    out_ref[0] = out_acc[...].reshape(bh, w_dim, cout).astype(
        out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('K', 'padding', 'radius',
                                             'interpret', 'block_h',
                                             'preshift'))
def deform_conv_shift_pallas(x: jnp.ndarray,
                             offset: jnp.ndarray,
                             mask: jnp.ndarray,
                             weight: jnp.ndarray,
                             bias: jnp.ndarray | None,
                             K: int = 3,
                             padding: int = 1,
                             radius: int = 1,
                             interpret: bool = False,
                             block_h: int | None = None,
                             preshift: bool = True) -> jnp.ndarray:
    """DCNv2 shift expansion in one fused VMEM pass per row band.

    Args match ``deform_conv.modulated_deform_conv``: x (N,H,W,Cin) NHWC,
    offset (N,H,W,2*K*K) [per-tap (dy, dx)], mask (N,H,W,K*K) already
    sigmoided, weight (K,K,Cin,Cout), bias (Cout,) or None.
    """
    N, H, W, Cin = x.shape
    Cout = weight.shape[-1]
    KK = K * K
    P = padding + radius + 1
    bh = block_h if block_h and H % block_h == 0 else _pick_block_h(H)

    # Mosaic slice-shape alignment: every sliced extent in the last two
    # (sublane, lane) dims must be a tile multiple — pad the width to a
    # sublane multiple (W8) and the padded band width to a sublane
    # multiple too; the extra zero columns are cropped after the call.
    W8 = -(-W // 8) * 8
    Wp = -(-(W8 + 2 * P) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (P, P), (P, Wp - W - P), (0, 0)))
    w_r = weight.reshape(KK, Cin, Cout).astype(x.dtype)
    off_f = offset.astype(jnp.float32)
    mask_c = mask.astype(x.dtype)
    if W8 != W:
        off_f = jnp.pad(off_f, ((0, 0), (0, 0), (0, W8 - W), (0, 0)))
        mask_c = jnp.pad(mask_c, ((0, 0), (0, 0), (0, W8 - W), (0, 0)))

    def kernel(off_ref, m_ref, w_ref, xp_hbm, out_ref, *scratch):
        if preshift:
            band, xsh, out_acc, sem = scratch
        else:
            band, out_acc, sem = scratch
            xsh = None
        _kernel(off_ref, m_ref, w_ref, xp_hbm, out_ref, band, xsh,
                out_acc, sem, K=K, padding=padding, radius=radius,
                bh=bh, P=P, w_dim=W8, cin=Cin, cout=Cout, dtype=x.dtype)

    n_shifts = K + 2 * radius + 1          # distinct x slice starts 1..n
    scratch_shapes = [pltpu.VMEM((bh + 2 * P, Wp, Cin), x.dtype)]
    if preshift:
        scratch_shapes.append(
            pltpu.VMEM((n_shifts, bh + 2 * P, W8, Cin), x.dtype))
    scratch_shapes += [pltpu.VMEM((bh * W8, Cout), jnp.float32),
                       pltpu.SemaphoreType.DMA(())]
    out = pl.pallas_call(
        kernel,
        grid=(N, H // bh),
        in_specs=[
            pl.BlockSpec((1, bh, W8, 2 * KK), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((1, bh, W8, KK), lambda n, i: (n, i, 0, 0)),
            pl.BlockSpec((KK, Cin, Cout), lambda n, i: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, bh, W8, Cout),
                               lambda n, i: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W8, Cout), x.dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(off_f, mask_c, w_r, xp)
    if W8 != W:
        out = out[:, :, :W]
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
