"""Parity tests for TPU ops against torch-CPU semantics.

The reference's compute path uses torch F.grid_sample / F.interpolate / DCNv2
(recursive_update.py:25,56; mspn_mmpose.py:385); these tests pin our XLA
formulations to the same numerics.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from das_tpu.ops.interp import (grid_sample, interpolate_bilinear_ac,
                                sample_bilinear_abs, upsample_nearest)
from das_tpu.ops.deform_conv import dcn_v2, modulated_deform_conv
from das_tpu.ops.oks_nms import (default_sigmas, oks_nms_fixed, oks_nms_np,
                                 soft_oks_nms_np)
from das_tpu.losses.common import (binary_cross_entropy, sigmoid_focal_loss,
                                   smooth_l1_loss)

RNG = np.random.RandomState(0)


def test_grid_sample_matches_torch():
    img = RNG.randn(2, 7, 9, 3).astype(np.float32)
    grid = (RNG.rand(2, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)

    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode='bilinear', padding_mode='zeros', align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_grid_sample_align_corners_true():
    img = RNG.randn(1, 8, 8, 2).astype(np.float32)
    grid = (RNG.rand(1, 4, 4, 2).astype(np.float32) * 2 - 1)
    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid),
                       align_corners=True)
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode='bilinear', padding_mode='zeros', align_corners=True)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_interpolate_bilinear_align_corners():
    x = RNG.randn(2, 5, 7, 4).astype(np.float32)
    ours = interpolate_bilinear_ac(jnp.asarray(x), 10, 14)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(10, 14), mode='bilinear', align_corners=True)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_upsample_nearest_matches_torch():
    x = RNG.randn(1, 4, 6, 2).astype(np.float32)
    ours = upsample_nearest(jnp.asarray(x), 8, 12)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(8, 12), mode='nearest')
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def _deform_conv_ref_np(x, offset, mask, weight, bias, pad=1):
    """Slow numpy DCNv2 reference (NCHW torch layout)."""
    n, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    out = np.zeros((n, cout, h, w), np.float64)

    def bilin(img, yy, xx):
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        val = 0.0
        for dy_, wy in ((y0, 1 - (yy - y0)), (y0 + 1, yy - y0)):
            for dx_, wx in ((x0, 1 - (xx - x0)), (x0 + 1, xx - x0)):
                if 0 <= dy_ < img.shape[0] and 0 <= dx_ < img.shape[1]:
                    val += img[dy_, dx_] * wy * wx
        return val

    for b in range(n):
        for i in range(h):
            for j in range(w):
                for k in range(kh * kw):
                    ky, kx = divmod(k, kw)
                    py = i - pad + ky + offset[b, 2 * k, i, j]
                    px = j - pad + kx + offset[b, 2 * k + 1, i, j]
                    m = mask[b, k, i, j]
                    for ci in range(cin):
                        v = bilin(x[b, ci], py, px) * m
                        out[b, :, i, j] += weight[:, ci, ky, kx] * v
    if bias is not None:
        out += bias[None, :, None, None]
    return out.astype(np.float32)


def test_modulated_deform_conv_matches_reference():
    n, cin, cout, h, w = 1, 3, 4, 5, 6
    x = RNG.randn(n, cin, h, w).astype(np.float32)
    offset = (RNG.randn(n, 18, h, w).astype(np.float32)) * 0.7
    mask = 1 / (1 + np.exp(-RNG.randn(n, 9, h, w).astype(np.float32)))
    weight = RNG.randn(cout, cin, 3, 3).astype(np.float32) * 0.2
    bias = RNG.randn(cout).astype(np.float32)

    ref = _deform_conv_ref_np(x, offset, mask, weight, bias)

    ours = modulated_deform_conv(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(offset.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)),
        jnp.asarray(weight.transpose(2, 3, 1, 0)),
        jnp.asarray(bias))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_deform_conv_shift_mode_matches_gather():
    """'shift' (dense shifted MACs) == gather modes for in-radius offsets.

    The shift lowering is exact whenever every learned offset lies in
    [-radius, radius]; out-of-radius offsets saturate at the box edge,
    which the second check pins (clamped gather == shift).
    """
    rng = np.random.RandomState(7)   # private: don't shift the shared stream
    n, cin, cout, h, w = 2, 3, 4, 6, 7
    x = rng.randn(n, h, w, cin).astype(np.float32)
    mask = 1 / (1 + np.exp(-rng.randn(n, h, w, 9).astype(np.float32)))
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2
    bias = rng.randn(cout).astype(np.float32)

    for radius in (1, 2):
        offset = (rng.rand(n, h, w, 18).astype(np.float32) * 2 - 1) * radius
        ref = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), gather_mode='patch')
        got = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), gather_mode='shift',
            shift_radius=radius)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    # out-of-radius offsets: shift == gather on the pre-clamped offsets
    big = (rng.rand(n, h, w, 18).astype(np.float32) * 2 - 1) * 5.0
    clamped = np.clip(big, -2.0, 2.0)
    ref = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(clamped), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), gather_mode='patch')
    got = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(big), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), gather_mode='shift',
        shift_radius=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_deform_conv_hybrid_mode_exact_for_any_offsets():
    """'hybrid' (shift base + budgeted exact pixel repairs) == gather
    modes for ARBITRARY offsets while the per-image count of pixels
    with any out-of-radius tap fits the budget; with the budget exceeded
    the overflow is countable via deform_offset_overflow."""
    from das_tpu.ops.deform_conv import deform_offset_overflow

    rng = np.random.RandomState(11)
    n, cin, cout, h, w = 2, 3, 4, 6, 7
    x = rng.randn(n, h, w, cin).astype(np.float32)
    mask = 1 / (1 + np.exp(-rng.randn(n, h, w, 9).astype(np.float32)))
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2
    bias = rng.randn(cout).astype(np.float32)

    # offsets far beyond any radius on ~20% of taps
    offset = (rng.rand(n, h, w, 18).astype(np.float32) * 2 - 1) * 0.8
    far = rng.rand(n, h, w, 9) < 0.2
    offset = offset.reshape(n, h, w, 9, 2)
    offset[far] *= 6.0
    offset = offset.reshape(n, h, w, 18)

    ref = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), gather_mode='patch')
    for radius in (1, 2):
        ovf = np.asarray(deform_offset_overflow(
            jnp.asarray(offset), radius, budget=h * w))
        assert (ovf == 0).all()
        got = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), gather_mode='hybrid',
            shift_radius=radius, shift_budget=h * w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5)
        # a tight-but-sufficient budget also stays exact
        n_flagged = int(np.asarray(deform_offset_overflow(
            jnp.asarray(offset), radius, budget=0)).max())
        got2 = modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias), gather_mode='hybrid',
            shift_radius=radius, shift_budget=n_flagged)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                                   atol=3e-5)

    # insufficient budget: overflow is reported (and nonzero)
    ovf = np.asarray(deform_offset_overflow(jnp.asarray(offset), 1,
                                            budget=2))
    assert (ovf > 0).all()

    # clean case (all offsets in-radius): the lax.cond repair must NOT
    # fire — hybrid is bitwise the shift base
    off_small = (rng.rand(n, h, w, 18).astype(np.float32) * 2 - 1) * 0.8
    args = (jnp.asarray(x), jnp.asarray(off_small), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))
    got = modulated_deform_conv(*args, gather_mode='hybrid',
                                shift_radius=1, shift_budget=4)
    want = modulated_deform_conv(*args, gather_mode='shift',
                                 shift_radius=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_deform_conv_pallas_shift_matches_xla_shift():
    """The fused Pallas kernel == the XLA shift expansion (fp tolerance:
    the kernel accumulates the tap contractions in f32), incl. the
    hybrid_pallas repair path for out-of-radius offsets."""
    rng = np.random.RandomState(7)
    n, cin, cout, h, w = 2, 3, 5, 8, 6
    x = rng.randn(n, h, w, cin).astype(np.float32)
    offset = (rng.rand(n, h, w, 18).astype(np.float32) * 2 - 1) * 1.4
    mask = 1 / (1 + np.exp(-rng.randn(n, h, w, 9).astype(np.float32)))
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2
    bias = rng.randn(cout).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), jnp.asarray(bias))

    for radius in (1, 2):
        want = modulated_deform_conv(*args, gather_mode='shift',
                                     shift_radius=radius)
        got = modulated_deform_conv(*args, gather_mode='shift_pallas',
                                    shift_radius=radius)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    # hybrid_pallas == hybrid (exact repair on the pallas base)
    off_far = offset.reshape(n, h, w, 9, 2).copy()
    off_far[rng.rand(n, h, w, 9) < 0.15] *= 5.0
    off_far = off_far.reshape(n, h, w, 18)
    ref = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(off_far), *args[2:],
        gather_mode='patch')
    got = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(off_far), *args[2:],
        gather_mode='hybrid_pallas', shift_radius=1, shift_budget=h * w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5)


def test_pallas_preshift_bitwise_equals_sliced():
    """The pre-shifted kernel variant (aligned VMEM copies of every x
    slice start — the serving default) is BITWISE the original
    misaligned-slice variant: same FMA order, same f32 accumulation;
    only the read layout changes. On-chip A/B: 17.6 -> 13.6 ms at the
    level-0 eval shape (see pallas_dcn._kernel)."""
    from das_tpu.ops.pallas_dcn import deform_conv_shift_pallas
    rng = np.random.RandomState(11)
    n, cin, cout, h, w = 2, 4, 6, 8, 11
    x = jnp.asarray(rng.randn(n, h, w, cin), jnp.float32)
    offset = jnp.asarray((rng.rand(n, h, w, 18) * 2 - 1) * 1.4,
                         jnp.float32)
    mask = jnp.asarray(1 / (1 + np.exp(-rng.randn(n, h, w, 9))),
                       jnp.float32)
    weight = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.randn(cout), jnp.float32)
    for radius in (1, 2):
        a = deform_conv_shift_pallas(x, offset, mask, weight, bias,
                                     radius=radius, interpret=True,
                                     preshift=False)
        b = deform_conv_shift_pallas(x, offset, mask, weight, bias,
                                     radius=radius, interpret=True,
                                     preshift=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dcn_v2_zero_offsets_equals_plain_conv():
    """With conv_offset weights at 0 (the init), DCNv2 == plain 3x3 conv."""
    n, cin, cout, h, w = 2, 4, 5, 6, 7
    x = RNG.randn(n, h, w, cin).astype(np.float32)
    weight = RNG.randn(3, 3, cin, cout).astype(np.float32) * 0.3
    bias = RNG.randn(cout).astype(np.float32)
    ow = np.zeros((3, 3, cin, 27), np.float32)
    ob = np.zeros(27, np.float32)

    ours = dcn_v2(jnp.asarray(x), jnp.asarray(ow), jnp.asarray(ob),
                  jnp.asarray(weight), jnp.asarray(bias))

    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(weight.transpose(3, 2, 0, 1)),
                   torch.from_numpy(bias), padding=1)
    # zero offset logits -> mask = sigmoid(0) = 0.5 scales every tap
    ref = ref * 0.5 + torch.from_numpy(bias)[None, :, None, None] * 0.5
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-4)


def test_oks_nms_fixed_matches_numpy():
    M, J = 40, 15
    kpts = RNG.rand(M, J, 2).astype(np.float32) * 50
    # create overlapping clusters
    kpts[1::4] = kpts[0::4][:len(kpts[1::4])] + RNG.randn(*kpts[1::4].shape)
    scores = RNG.rand(M).astype(np.float32)
    areas = (kpts[..., 0].max(1) - kpts[..., 0].min(1)) * \
        (kpts[..., 1].max(1) - kpts[..., 1].min(1))
    sig = default_sigmas(J)

    db = [dict(score=scores[i],
               keypoints=np.concatenate(
                   [kpts[i], np.ones((J, 1), np.float32)], -1),
               area=areas[i]) for i in range(M)]
    ref_keep = oks_nms_np(db, thr=0.9).tolist()

    # new contract: unsorted input, (gather, valid) out in greedy order
    gather, out_valid = oks_nms_fixed(jnp.asarray(kpts),
                                      jnp.asarray(scores),
                                      jnp.asarray(areas),
                                      jnp.ones(M, bool), 0.9, sig)
    ours_keep = np.asarray(gather)[np.asarray(out_valid)].tolist()
    assert ours_keep == ref_keep


def test_soft_oks_nms_runs():
    J = 15
    kpts = RNG.rand(5, J, 3).astype(np.float32) * 40
    db = [dict(score=float(i) / 5 + .1, keypoints=kpts[i], area=100.0)
          for i in range(5)]
    keep = soft_oks_nms_np(db, thr=0.9, max_dets=3)
    assert len(keep) == 3


def test_focal_loss_matches_manual_torch():
    logits = RNG.randn(32, 1).astype(np.float32)
    labels = RNG.randint(0, 2, 32).astype(np.int64)  # 1 == background

    t = torch.from_numpy(logits)
    target = F.one_hot(torch.from_numpy(labels), 2)[:, :1].float()
    p = torch.sigmoid(t)
    pt = (1 - p) * target + p * (1 - target)
    fw = (0.25 * target + 0.75 * (1 - target)) * pt.pow(2.0)
    ref = (F.binary_cross_entropy_with_logits(
        t, target, reduction='none') * fw).sum() / 7.0

    ours = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                              avg_factor=7.0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_smooth_l1_matches_torch():
    pred = RNG.randn(13).astype(np.float32)
    tgt = RNG.randn(13).astype(np.float32)
    ref = F.smooth_l1_loss(torch.from_numpy(pred), torch.from_numpy(tgt),
                           beta=1 / 9, reduction='sum') / 13.0
    ours = smooth_l1_loss(jnp.asarray(pred), jnp.asarray(tgt),
                          avg_factor=13.0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bce_mean_matches_torch():
    logits = RNG.randn(9).astype(np.float32)
    targets = RNG.rand(9).astype(np.float32)
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets))
    ours = binary_cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bilinear_bf16_coords_right_edge():
    """Coordinates must interpolate fractionally even past x=128 where
    bf16 has integer-only resolution (regression: bf16 coordinate math
    degraded bilinear to nearest on the right/bottom of the map)."""
    from das_tpu.ops.interp import sample_bilinear_abs

    H, W = 8, 256
    img = np.zeros((1, H, W, 1), np.float32)
    img[0, :, :, 0] = np.arange(W)[None, :]          # value == x coord
    img_b = jnp.asarray(img, jnp.bfloat16)
    x = jnp.asarray([[200.5]], jnp.bfloat16)         # half-pixel at x>128
    y = jnp.asarray([[3.0]], jnp.bfloat16)
    out = sample_bilinear_abs(img_b, x, y)
    np.testing.assert_allclose(float(out[0, 0, 0]), 200.5, atol=0.51)
    # and in f32 exact
    out32 = sample_bilinear_abs(jnp.asarray(img), jnp.asarray([[200.5]]),
                                jnp.asarray([[3.0]]))
    np.testing.assert_allclose(float(out32[0, 0, 0]), 200.5, rtol=1e-6)


def test_sample_bilinear_gather_modes_agree():
    """Every gather lowering computes the identical sample (incl. out-of-
    bounds zeros and exact-integer coords at the border)."""
    from das_tpu.ops.interp import sample_bilinear_abs
    img = jnp.asarray(RNG.randn(2, 9, 11, 5).astype(np.float32))
    coords = [
        (RNG.uniform(-3, 14, (2, 64)), RNG.uniform(-3, 12, (2, 64))),
        (RNG.randint(-2, 13, (2, 32)).astype(np.float64),
         RNG.randint(-2, 11, (2, 32)).astype(np.float64)),
    ]
    for x, y in coords:
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        ref = sample_bilinear_abs(img, x, y, gather_mode='fill')
        for mode in ('clip', 'one_hot', 'patch', 'xpack'):
            got = sample_bilinear_abs(img, x, y, gather_mode=mode)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(ref), err_msg=mode)


def test_deform_conv_lowering_gradients_match():
    """The train-mode lowerings must agree in GRADIENTS, not just values:
    d(loss)/d{x, offset, mask, weight} of 'shift' and 'hybrid' match the
    exact 'clip' gathers for in-radius offsets, and 'hybrid' stays
    gradient-exact for out-of-radius offsets covered by the repair
    budget (the basis for dcn_train_gather_mode='hybrid' training)."""
    import jax

    rng = np.random.RandomState(11)
    n, cin, cout, h, w = 2, 3, 4, 6, 7
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    mask = jnp.asarray(
        1 / (1 + np.exp(-rng.randn(n, h, w, 9).astype(np.float32))))
    weight = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * .2)
    g_out = jnp.asarray(rng.randn(n, h, w, cout).astype(np.float32))

    def grads(offset, mode, radius):
        def loss(x, offset, mask, weight):
            out = modulated_deform_conv(
                x, offset, mask, weight, None, gather_mode=mode,
                shift_radius=radius, shift_budget=16)
            return (out * g_out).sum()
        return jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask,
                                                    weight)

    # in-radius offsets: all three lowerings gradient-identical.
    # Stay off hat-weight kinks (integer offset distances), where
    # clip's lerp d/d(offset) and shift's |.|-subgradient legitimately
    # pick different one-sided values.
    off_in = jnp.asarray(
        ((rng.rand(n, h, w, 18) * 1.6 - 0.8) * 0.9 + 0.05)
        .astype(np.float32))
    ref = grads(off_in, 'clip', 1)
    for mode in ('shift', 'hybrid'):
        got = grads(off_in, mode, 1)
        for r, g, name in zip(ref, got, ('x', 'offset', 'mask', 'weight')):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=3e-5,
                err_msg=f'{mode} grad d/d{name} drifted')

    # out-of-radius offsets within the repair budget: 'hybrid' stays
    # gradient-exact (every flagged pixel's taps recomputed exactly)
    off_big = off_in.at[:, 2:4, 2:5, :].add(3.0)
    ref = grads(off_big, 'clip', 1)
    got = grads(off_big, 'hybrid', 1)
    for r, g, name in zip(ref, got, ('x', 'offset', 'mask', 'weight')):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=3e-5,
            err_msg=f'hybrid out-of-radius grad d/d{name} drifted')


def test_conv_gn_relu_matches_xla():
    """The fused conv+GN+relu tower kernel (ops/pallas_convgn) matches
    the XLA ConvModule path (lax.conv -> flax GroupNorm -> relu) at fp
    tolerance; odd widths exercise the zero-pad-column stat masking and
    the flat-shift guard rows."""
    import jax
    import flax.linen as nn
    from das_tpu.ops.pallas_convgn import conv_gn_relu

    rng = np.random.RandomState(3)
    for (h, w, cin, cout, g) in ((8, 16, 8, 8, 4), (10, 18, 32, 64, 8),
                                 (20, 36, 64, 64, 32)):
        x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
        wt = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
        gamma = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
        beta = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, wt, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        gn = nn.GroupNorm(num_groups=g, epsilon=1e-5)
        ref = nn.relu(gn.apply({'params': {'scale': gamma,
                                           'bias': beta}}, y))
        out = conv_gn_relu(x, wt, gamma, beta, groups=g, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
