"""Modulated deformable convolution (DCNv2) as gather + MXU matmul.

The reference uses mmcv's CUDA ``ModulatedDeformConv2dPack`` on the last conv
of every head tower (ref: anchor_free_mono3d_pose_head.py:111-112,
das_head.py:107-108) and inside the recursive-update feature convs
(ref: recursive_update.py:177-178). There is no deformable-conv XLA op, so we
express it TPU-natively: bilinear-gather the K*K deformed taps, modulate, and
contract the (K*K*Cin) axis against the kernel on the MXU.

Semantics match mmcv's pack layer:
  * ``conv_offset`` (a plain conv, zero-init) produces 3*K*K channels:
    the first 2*K*K are (dy, dx) interleaved per kernel tap (row-major),
    the last K*K are mask logits passed through sigmoid.
  * sampling uses zero padding outside the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interp import sample_bilinear_abs


def modulated_deform_conv(x: jnp.ndarray,
                          offset: jnp.ndarray,
                          mask: jnp.ndarray,
                          weight: jnp.ndarray,
                          bias: jnp.ndarray = None,
                          kernel_size: int = 3,
                          padding: int = 1,
                          gather_mode: str = 'patch',
                          shift_radius: int = 2,
                          shift_budget: int = 2048) -> jnp.ndarray:
    """DCNv2 forward, stride 1, dilation 1, deform_groups 1, NHWC.

    Args:
        x:      (N, H, W, Cin)
        offset: (N, H, W, 2*K*K) — (dy, dx) interleaved per tap, row-major
        mask:   (N, H, W, K*K)   — already sigmoid-activated
        weight: (K, K, Cin, Cout)
        bias:   (Cout,) or None
        gather_mode: XLA lowering for the deformed-tap fetch. ``'patch'``/
            ``'clip'``/``'fill'``/``'one_hot'`` are bit-equal gather
            formulations; ``'shift'`` replaces the random-access gather
            with dense shifted multiply-adds (streaming reads at full HBM
            bandwidth) and is exact iff every offset lies in
            ``[-shift_radius, shift_radius]`` — offsets are clamped to
            that box, so larger learned offsets saturate; ``'hybrid'`` is
            the shift base plus exact sparse corrections for up to
            ``shift_budget`` out-of-radius taps per image (exact DCNv2
            semantics while ``deform_offset_overflow`` is 0).
    Returns:
        (N, H, W, Cout)
    """
    N, H, W, Cin = x.shape
    K = kernel_size
    Cout = weight.shape[-1]

    if gather_mode == 'shift':
        return _deform_conv_shift(x, offset, mask, weight, bias,
                                  K, padding, shift_radius)
    if gather_mode == 'hybrid':
        return _deform_conv_hybrid(x, offset, mask, weight, bias,
                                   K, padding, shift_radius, shift_budget)
    if gather_mode in ('shift_pallas', 'hybrid_pallas'):
        from .pallas_dcn import deform_conv_shift_pallas
        # devices()[0].platform, not default_backend(): the axon plugin
        # reports backend 'tpu' even when jax_platforms forces cpu.
        # Honor a jax.default_device(cpu) context too (init_all runs
        # eager param init on the host CPU backend).
        dd = jax.config.jax_default_device
        platform = dd.platform if dd is not None \
            else jax.devices()[0].platform
        interpret = platform != 'tpu'
        base = deform_conv_shift_pallas(x, offset, mask, weight, bias,
                                        K=K, padding=padding,
                                        radius=shift_radius,
                                        interpret=interpret)
        if gather_mode == 'shift_pallas':
            return base
        return _hybrid_repair(base, x, offset, mask, weight, bias,
                              K, padding, shift_radius, shift_budget)

    # Base grid of output pixel centres. Coordinate math stays f32 even in
    # bf16 mode (bf16 coords >= 128 lose the fractional part entirely).
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]      # (1,H,1)
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]      # (1,1,W)

    # Per-tap accumulation: gather one deformed tap, contract it on the
    # MXU, add into the accumulator. Avoids materialising the full
    # (N, H, W, K*K, Cin) tap tensor — 10x less XLA temp memory (and HBM
    # traffic) than the stacked-taps einsum at the stride-4 level.
    out = jnp.zeros((N, H, W, Cout), x.dtype) if bias is None else \
        jnp.broadcast_to(bias.astype(x.dtype), (N, H, W, Cout))
    for k in range(K * K):
        kh, kw = divmod(k, K)
        sy = ys + (kh - padding) + \
            offset[..., 2 * k].astype(jnp.float32)            # (N,H,W)
        sx = xs + (kw - padding) + \
            offset[..., 2 * k + 1].astype(jnp.float32)
        tap = sample_bilinear_abs(x, sx, sy, gather_mode=gather_mode) \
            * mask[..., k:k + 1]
        # torch kernel layout (Cout, Cin, kh, kw) maps to ours as
        # weight[kh, kw, cin, cout]
        out = out + jnp.einsum('nhwc,co->nhwo', tap, weight[kh, kw],
                               preferred_element_type=x.dtype)
    return out


def _deform_conv_shift(x: jnp.ndarray,
                       offset: jnp.ndarray,
                       mask: jnp.ndarray,
                       weight: jnp.ndarray,
                       bias: jnp.ndarray,
                       K: int,
                       padding: int,
                       radius: int) -> jnp.ndarray:
    """DCNv2 via dense shifted multiply-adds (no gathers).

    Each tap's bilinear sample is the hat-function expansion
    ``tap(p) = sum_d hat(dy - δy(p)) * hat(dx - δx(p)) * x(p + d)`` over
    integer displacements ``d``; with the per-tap offset clamped to
    ``[-radius, radius]`` the sum is exact over a static
    ``(2*radius+2)^2`` window, and every ``x(p + d)`` is a static slice
    of the zero-padded map — pure streaming VPU work instead of
    per-row DMA gathers. Zeros padding outside the image falls out of
    the zero pad. Same semantics as the gather modes whenever the true
    offsets fit in the radius box.

    (A separable two-pass variant was tried and is WRONG: the hat
    weights belong to the output pixel, whose offset field varies along
    both axes, so a vertical pre-pass would mix the horizontal
    neighbours' vertical weights.)
    """
    N, H, W, Cin = x.shape
    Cout = weight.shape[-1]
    # pad enough that every shifted window is a legal static slice
    P = padding + radius + 1
    xp = jnp.pad(x, ((0, 0), (P, P), (P, P), (0, 0)))
    out = jnp.zeros((N, H, W, Cout), x.dtype) if bias is None else \
        jnp.broadcast_to(bias.astype(x.dtype), (N, H, W, Cout))
    r = float(radius)
    for k in range(K * K):
        kh, kw = divmod(k, K)
        dy = jnp.clip(offset[..., 2 * k].astype(jnp.float32), -r, r) \
            + (kh - padding)                                   # (N,H,W)
        dx = jnp.clip(offset[..., 2 * k + 1].astype(jnp.float32), -r, r) \
            + (kw - padding)
        acc = jnp.zeros((N, H, W, Cin), x.dtype)
        for iy in range(kh - padding - radius, kh - padding + radius + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy - dy))
            for ix in range(kw - padding - radius,
                            kw - padding + radius + 2):
                w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(ix - dx))
                acc = acc + xp[:, iy + P:iy + P + H, ix + P:ix + P + W] \
                    * w.astype(x.dtype)[..., None]
        acc = acc * mask[..., k:k + 1]
        out = out + jnp.einsum('nhwc,co->nhwo', acc, weight[kh, kw],
                               preferred_element_type=x.dtype)
    return out


def deform_offset_overflow(offset: jnp.ndarray, radius: int,
                           budget: int) -> jnp.ndarray:
    """Per-image count of pixels (beyond the hybrid budget) having any
    out-of-radius tap offset.

    The 'hybrid' lowering is exact DCNv2 iff this is 0 for every image;
    use it to validate a trained checkpoint before trusting hybrid-mode
    outputs (cf. the loss's ``pos_overflow`` pattern)."""
    off = offset.astype(jnp.float32)
    N = off.shape[0]
    oor_px = (jnp.abs(off.reshape(N, -1, off.shape[-1] // 2, 2))
              > radius).any((-1, -2))
    return jnp.maximum(oor_px.sum(-1) - budget, 0)


def _deform_conv_hybrid(x: jnp.ndarray,
                        offset: jnp.ndarray,
                        mask: jnp.ndarray,
                        weight: jnp.ndarray,
                        bias: jnp.ndarray,
                        K: int,
                        padding: int,
                        radius: int,
                        budget: int) -> jnp.ndarray:
    """Exact DCNv2 = dense shift base + budgeted exact pixel repairs.

    The streaming shift expansion (``_deform_conv_shift``) is exact only
    for offsets within ±radius. This mode keeps its full-bandwidth dense
    base and REPAIRS the (rare, zero at init) pixels where any learned
    tap offset leaves the radius box: the ``budget`` worst such pixels
    per image are recomputed with the exact gather formulation — all
    K*K taps bilinear-sampled at their true locations, modulated,
    contracted — and scatter-SET into the output, making those pixels
    bitwise the gather-mode value.

    Exact DCNv2 semantics while the per-image flagged-pixel count is
    ≤ budget — check with ``deform_offset_overflow``. In-radius pixels
    keep the shift formulation's value (equal up to fp rounding of the
    hat-weight expression vs the gather modes' lerp weights).

    The repair sits under a ``lax.cond`` on "any pixel flagged", so the
    expected case (a validated checkpoint: zero flagged pixels — always
    true at init) pays only the shift base plus one cheap reduce over
    the offset field. Measured on-chip (640x1152 B=4): cond-gated hybrid
    runs at shift speed (~17.7 img/s) vs 5.1 img/s when the selection
    (top_k over H*W), sparse K*K-tap patch gather, (budget, Cin)xCout
    contraction and budget-row scatter ran unconditionally every layer.
    """
    base = _deform_conv_shift(x, offset, mask, weight, bias, K, padding,
                              radius)
    return _hybrid_repair(base, x, offset, mask, weight, bias, K,
                          padding, radius, budget)


def _hybrid_repair(base, x, offset, mask, weight, bias, K, padding,
                   radius, budget):
    """Cond-gated exact repair of out-of-radius pixels on any shift base."""
    N, H, W, Cin = x.shape
    Cout = weight.shape[-1]
    KK = K * K
    HW = H * W
    M = min(budget, HW)
    r = float(radius)

    off = offset.astype(jnp.float32).reshape(N, HW, KK, 2)
    # per-pixel violation score: worst tap's distance outside the box
    score = (jnp.abs(off).max((-1, -2)) - r)                    # (N, HW)

    def repair(base):
        _, p = jax.lax.top_k(score, M)                          # (N, M)
        valid = jnp.take_along_axis(score, p, axis=1) > 0       # (N, M)

        py = (p // W).astype(jnp.float32)
        px = (p % W).astype(jnp.float32)
        d = jnp.take_along_axis(off, p[..., None, None].repeat(KK, 2)
                                .repeat(2, 3), axis=1)          # (N,M,KK,2)
        m_sel = jnp.take_along_axis(mask.reshape(N, HW, KK),
                                    p[..., None].repeat(KK, 2), axis=1)

        # exact gather recompute of the selected pixels, same tap order
        # and accumulation as the 'patch' dense mode -> bitwise the
        # gather-mode value
        exact = jnp.zeros((N, M, Cout), x.dtype) if bias is None else \
            jnp.broadcast_to(bias.astype(x.dtype), (N, M, Cout))
        for t in range(KK):
            kh, kw = divmod(t, K)
            sy = py + (kh - padding) + d[..., t, 0]
            sx = px + (kw - padding) + d[..., t, 1]
            tap = sample_bilinear_abs(x, sx, sy, gather_mode='patch') \
                * m_sel[..., t:t + 1].astype(x.dtype)
            exact = exact + jnp.einsum('nmc,co->nmo', tap,
                                       weight[kh, kw],
                                       preferred_element_type=x.dtype)

        flat = base.reshape(N, HW, Cout)
        nidx = jnp.arange(N)[:, None]
        repaired = jnp.where(valid[..., None], exact,
                             jnp.take_along_axis(
                                 flat, p[..., None].repeat(Cout, 2),
                                 axis=1))
        return flat.at[nidx, p].set(repaired).reshape(base.shape)

    return jax.lax.cond(jnp.any(score > 0), repair, lambda b: b, base)


def dcn_v2(x: jnp.ndarray,
           offset_weight: jnp.ndarray,
           offset_bias: jnp.ndarray,
           weight: jnp.ndarray,
           bias: jnp.ndarray = None,
           kernel_size: int = 3,
           padding: int = 1,
           gather_mode: str = 'patch',
           shift_radius: int = 2) -> jnp.ndarray:
    """Full DCNv2 pack: compute offsets/mask with a plain conv, then deform.

    Args:
        x: (N, H, W, Cin)
        offset_weight: (K, K, Cin, 3*K*K) — the ``conv_offset`` kernel
        offset_bias:   (3*K*K,)
        weight: (K, K, Cin, Cout) main kernel; bias: (Cout,) or None
    """
    import jax
    import jax.lax as lax
    K = kernel_size
    KK = K * K
    raw = lax.conv_general_dilated(
        x, offset_weight,
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    raw = raw + offset_bias
    # mmcv pack: chunk(3) -> (o1, o2, mask); offset = cat(o1, o2)
    offset = raw[..., :2 * KK]
    mask = jax.nn.sigmoid(raw[..., 2 * KK:])
    return modulated_deform_conv(x, offset, mask, weight, bias,
                                 kernel_size, padding,
                                 gather_mode=gather_mode,
                                 shift_radius=shift_radius)
