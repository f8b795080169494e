"""Recursive joint-offset refinement branch (TPU/flax rebuild).

Rebuilds the reference's ``RecursiveUpdateBranch``
(ref: mmdet3d/models/pose_heads/recursive_update.py:238-255): a 1x1
reduction followed by N refinement layers. Each layer

  1. updates features with a DCNv2 conv and gates the joint-offset field
     (``NextLevelOffset``, ref :164-197),
  2. re-samples the offset field at head-proposed locations — including the
     currently-predicted joint location — with bilinear sampling, and fuses
     the 2*num_heads proposals with a per-dim softmax over sampled
     confidences (``offset_sample`` / ``offset_sample_core``, ref :9-82).

The torch path normalises coordinates for ``F.grid_sample``; since the
normalisation and the sampler's half-pixel convention cancel exactly, the
TPU version samples at absolute pixel coordinates directly
(das_tpu.ops.interp.sample_bilinear_abs), which keeps one fused gather.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.interp import sample_bilinear_abs
from .layers import ConvModule

Dtype = Any


def _resolve_gather_mode(mode: str, table_rows: int,
                         train: bool = False) -> str:
    """Resolve the gather lowering used by the offset sampling.

    Round-5 standalone A/B at the sparse path's real level-0 shape
    (60x160x288x6 table, 480k candidate rows, chained best-window):
    'xpack' 6.6 ms < packed-24ch 7.8 < 'patch' 9.8 < 4x'clip' 18.1 —
    the (2,1,2C) window from an x-packed table fetches the same corners
    with twice the lanes per row (see ops/interp._sample_xpack).
    Round-4 e2e ranking (e2e_mode_bench.py --ru-mode, B=4 640x1152):
    'patch' 18.76 img/s vs 'clip' 17.31. Earlier dense-path ranking
    (dcn_bench.py, round 3): 'clip' 174 ms, 'one_hot' 223 ms (the
    one-hot matmul burns table_rows^2 MXU work). All lowerings are
    bit-equal (test-pinned); the knob stays because the ranking is
    backend-dependent.

    TRAIN resolves to 'clip': the transpose of the patch/xpack window
    gathers is a windowed scatter-add whose execution crashed the v5e
    TPU worker ("kernel fault", reproduced 3x at B in {2, 4}, round 4)
    — the row-gather adjoint runs fine."""
    del table_rows
    if mode != 'auto':
        return mode
    return 'clip' if train else 'xpack'


def _offset_sample(uvd: jnp.ndarray,
                   sampling_offset: jnp.ndarray,
                   joint_conf: jnp.ndarray,
                   num_joints: int,
                   num_heads: int,
                   dim: int,
                   gather_mode: str = 'auto',
                   train: bool = False) -> jnp.ndarray:
    """Multi-head deformable re-sampling of the joint-offset field.

    Args (all NHWC):
        uvd:             (N, H, W, J*dim)     per-point joint offsets
        sampling_offset: (N, H, W, J*heads*2) head displacement proposals
        joint_conf:      (N, H, W, J*dim)     confidence field
    Returns:
        (N, H, W, J*dim) refined offsets.
    """
    N, H, W, _ = uvd.shape
    J, Hd, D = num_joints, num_heads, dim
    gather_mode = _resolve_gather_mode(gather_mode, H * W, train)

    # fold joints into the batch axis: (N*J, H, W, c)
    def fold(x, c):
        x = x.reshape(N, H, W, J, c)
        x = x.transpose(0, 3, 1, 2, 4)
        return x.reshape(N * J, H, W, c)

    uvd_j = fold(uvd, D)                                   # (NJ, H, W, D)
    samp_j = fold(sampling_offset, Hd * 2)                 # (NJ, H, W, 2Hd)
    conf_j = fold(joint_conf, D)                           # (NJ, H, W, D)

    # coordinate math in f32 (bf16 coords >= 128 lose their fraction)
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :] + 0.5
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None] + 0.5

    # --- heads sampled at the predicted target location -------------------
    off_to_target = uvd_j[..., :2]                          # (NJ, H, W, 2)
    tx = xs + off_to_target[..., 0].astype(jnp.float32) - 0.5
    ty = ys + off_to_target[..., 1].astype(jnp.float32) - 0.5
    off_from_target = sample_bilinear_abs(samp_j, tx, ty,
                                          gather_mode=gather_mode)  # (NJ,H,W,2Hd)
    off_from_target = off_from_target.reshape(N * J, H, W, Hd, 2) \
        + off_to_target[..., None, :]

    # --- heads sampled at the source point ---------------------------------
    off_from_source = samp_j.reshape(N * J, H, W, Hd, 2)

    # (NJ, H, W, 2Hd, 2) candidate displacements
    samp_off = jnp.concatenate([off_from_target, off_from_source], axis=3)

    # Sample [uvd, conf] at each candidate location with an ONLINE softmax
    # over candidates: one candidate's gather + fusion at a time keeps the
    # live set at (NJ, H, W, D) instead of (NJ, H, W, 2Hd, 2D) — the same
    # memory treatment as the per-tap deform conv.
    feat = jnp.concatenate([uvd_j, conf_j], axis=-1)       # (NJ, H, W, 2D)
    run_max = jnp.full((N * J, H, W, D), -jnp.inf, feat.dtype)
    run_sum = jnp.zeros((N * J, H, W, D), feat.dtype)
    run_acc = jnp.zeros((N * J, H, W, D), feat.dtype)
    for c in range(2 * Hd):
        off_c = samp_off[:, :, :, c, :]                    # (NJ, H, W, 2)
        sx = xs + off_c[..., 0].astype(jnp.float32) - 0.5
        sy = ys + off_c[..., 1].astype(jnp.float32) - 0.5
        s = sample_bilinear_abs(feat, sx, sy,
                                gather_mode=gather_mode)  # (NJ, H, W, 2D)
        s_uvd, s_conf = s[..., :D], s[..., D:]
        if D == 3:
            diff = jnp.concatenate(
                [off_c, jnp.zeros_like(off_c[..., :1])], axis=-1)
        else:
            diff = off_c
        val = s_uvd + diff
        new_max = jnp.maximum(run_max, s_conf)
        corr = jnp.exp(run_max - new_max)
        w = jnp.exp(s_conf - new_max)
        run_sum = run_sum * corr + w
        run_acc = run_acc * corr + w * val
        run_max = new_max
    fused = run_acc / run_sum                              # (NJ, H, W, D)

    fused = fused.reshape(N, J, H, W, D).transpose(0, 2, 3, 1, 4)
    return fused.reshape(N, H, W, J * D)


def _offset_sample_sparse(uvd: jnp.ndarray,
                          sampling_offset: jnp.ndarray,
                          joint_conf: jnp.ndarray,
                          select_idx: jnp.ndarray,
                          num_joints: int,
                          num_heads: int,
                          dim: int,
                          gather_mode: str = 'auto',
                          train: bool = False) -> jnp.ndarray:
    """``_offset_sample`` restricted to ``select_idx`` flat spatial points.

    Eval-path optimization: the fused decode consumes at most ``nms_pre``
    candidates per level, chosen by score*centerness — a ranking that does
    not depend on this refinement. Refining every point is wasted work
    (level-0 of the 640x1152 Panoptic eval shape is 2.76M points/batch vs
    nms_pre=1000 per image; the dense sampling was 77% of the measured
    inference step). The math here is identical to ``_offset_sample`` at
    the selected points, so decode outputs are bitwise unchanged.

    Args:
        uvd/sampling_offset/joint_conf: dense fields as in _offset_sample.
        select_idx: (N, K) int32 flat spatial indices (y * W + x).
    Returns:
        (N, K, J*dim) refined offsets at the selected points.
    """
    N, H, W, _ = uvd.shape
    J, Hd, D = num_joints, num_heads, dim
    K = select_idx.shape[1]
    gather_mode = _resolve_gather_mode(gather_mode, H * W, train)

    def fold(x, c):
        x = x.reshape(N, H, W, J, c)
        x = x.transpose(0, 3, 1, 2, 4)
        return x.reshape(N * J, H, W, c)

    uvd_j = fold(uvd, D)
    samp_j = fold(sampling_offset, Hd * 2)
    conf_j = fold(joint_conf, D)

    idxj = jnp.broadcast_to(select_idx[:, None, :],
                            (N, J, K)).reshape(N * J, K)
    xk = (idxj % W).astype(jnp.float32) + 0.5
    yk = (idxj // W).astype(jnp.float32) + 0.5

    def take_at(field, c):
        return jnp.take_along_axis(field.reshape(N * J, H * W, c),
                                   idxj[..., None], axis=1, mode='clip')

    uvd_sel = take_at(uvd_j, D)                            # (NJ, K, D)
    samp_sel = take_at(samp_j, Hd * 2)                     # (NJ, K, 2Hd)

    off_to_target = uvd_sel[..., :2]
    tx = xk + off_to_target[..., 0].astype(jnp.float32) - 0.5
    ty = yk + off_to_target[..., 1].astype(jnp.float32) - 0.5
    off_from_target = sample_bilinear_abs(
        samp_j, tx, ty, gather_mode=gather_mode)           # (NJ, K, 2Hd)
    off_from_target = off_from_target.reshape(N * J, K, Hd, 2) \
        + off_to_target[..., None, :]
    off_from_source = samp_sel.reshape(N * J, K, Hd, 2)
    samp_off = jnp.concatenate([off_from_target, off_from_source], axis=2)

    feat = jnp.concatenate([uvd_j, conf_j], axis=-1)       # (NJ, H, W, 2D)
    # ONE batched gather for all 2*Hd candidates (the sparse point count
    # is small, so materializing (NJ, K, 2Hd, 2D) is cheap): per-point
    # sampling is independent, so the values are bitwise those of
    # per-candidate calls, while the gather op count (and the adjoint
    # scatter-add count under training) drops 2*Hd-fold — measured
    # 70 ms of the 735 ms shift-mode train step was these row gathers.
    sx = xk[:, :, None] + samp_off[..., 0].astype(jnp.float32) - 0.5
    sy = yk[:, :, None] + samp_off[..., 1].astype(jnp.float32) - 0.5
    s_all = sample_bilinear_abs(
        feat, sx.reshape(N * J, K * 2 * Hd),
        sy.reshape(N * J, K * 2 * Hd),
        gather_mode=gather_mode).reshape(N * J, K, 2 * Hd, 2 * D)
    # identical accumulation ORDER as the dense online-softmax loop ->
    # fused values stay bitwise equal to the dense path (test-pinned)
    run_max = jnp.full((N * J, K, D), -jnp.inf, feat.dtype)
    run_sum = jnp.zeros((N * J, K, D), feat.dtype)
    run_acc = jnp.zeros((N * J, K, D), feat.dtype)
    for c in range(2 * Hd):
        off_c = samp_off[:, :, c, :]                       # (NJ, K, 2)
        s = s_all[:, :, c]                                 # (NJ, K, 2D)
        s_uvd, s_conf = s[..., :D], s[..., D:]
        if D == 3:
            diff = jnp.concatenate(
                [off_c, jnp.zeros_like(off_c[..., :1])], axis=-1)
        else:
            diff = off_c
        val = s_uvd + diff
        new_max = jnp.maximum(run_max, s_conf)
        corr = jnp.exp(run_max - new_max)
        w = jnp.exp(s_conf - new_max)
        run_sum = run_sum * corr + w
        run_acc = run_acc * corr + w * val
        run_max = new_max
    fused = run_acc / run_sum                              # (NJ, K, D)

    fused = fused.reshape(N, J, K, D).transpose(0, 2, 1, 3)
    return fused.reshape(N, K, J * D)


class DepthSample(nn.Module):
    """Multi-head deformable depth refinement (ref recursive_update.py:85-161).

    Defined-but-unwired in the reference (DASHead never instantiates it);
    kept for component parity. Samples the initial depth map at
    ``num_heads`` learned offsets (optionally root-centred) and fuses with
    softmax confidences.
    """
    num_heads: int
    feat_channels: Optional[int] = None
    norm_type: str = 'hw'
    root_centered: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, init_depth: jnp.ndarray,
                 stride: float, root_offset: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        N, H, W, C = feat.shape
        fc = self.feat_channels or C
        identity = feat
        upd = ConvModule(fc, 3, 1, 1, dcn=True,
                         norm_cfg=dict(type='GN', num_groups=32),
                         dtype=self.dtype,
                         name='update_feat_conv')(feat, train)
        if fc == C:
            feat = identity + upd
        else:
            feat = upd

        num_heads = self.num_heads
        samp_off = nn.Conv(num_heads * 2, (1, 1), use_bias=False,
                           kernel_init=nn.initializers.normal(1e-2),
                           dtype=self.dtype, name='sample_conv')(feat)
        conf = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                       name='conf_conv')(feat)

        xs = jnp.arange(W, dtype=jnp.float32)[None, None, :] + 0.5
        ys = jnp.arange(H, dtype=jnp.float32)[None, :, None] + 0.5

        if self.root_centered:
            assert self.norm_type == 'hw' and root_offset is not None
            num_heads = num_heads + 1
            ro = jax.lax.stop_gradient(root_offset)          # (N,H,W,2)
            rx = xs + ro[..., 0] - 0.5
            ry = ys + ro[..., 1] - 0.5
            off_from_root = sample_bilinear_abs(samp_off, rx, ry)
            samp_off = jnp.concatenate(
                [off_from_root, jnp.zeros_like(ro)], axis=-1) + \
                jnp.tile(ro, (1, 1, 1, num_heads))

        off = samp_off.reshape(N, H, W, num_heads, 2).astype(jnp.float32)
        if self.norm_type == 'hw':
            pass                                             # absolute px
        elif self.norm_type == 'stride':
            off = off * (jnp.asarray([W, H], jnp.float32) / stride)
        else:
            raise NotImplementedError(self.norm_type)

        field = jnp.concatenate([init_depth, conf], axis=-1)  # (N,H,W,2)
        sx = xs[..., None] + off[..., 0] - 0.5
        sy = ys[..., None] + off[..., 1] - 0.5
        sampled = sample_bilinear_abs(field, sx, sy)          # (N,H,W,h,2)
        d, c = sampled[..., 0], sampled[..., 1]
        w = jax.nn.softmax(c, axis=-1)
        return (d * w).sum(-1, keepdims=True)


class NextLevelOffset(nn.Module):
    """Gated offset update + proposal heads (ref recursive_update.py:164)."""
    num_joints: int
    num_heads: int
    dim: int = 3
    dcn_gather_mode: str = 'patch'
    dcn_train_gather_mode: str = 'auto'
    dcn_shift_radius: int = 2
    dcn_shift_budget: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, offset: jnp.ndarray,
                 train: bool = False):
        J, Hd, D = self.num_joints, self.num_heads, self.dim
        upd = ConvModule(feat.shape[-1], 3, 1, 1, dcn=True,
                         norm_cfg=dict(type='GN', num_groups=32),
                         dcn_gather_mode=self.dcn_gather_mode,
                         dcn_train_gather_mode=self.dcn_train_gather_mode,
                         dcn_shift_radius=self.dcn_shift_radius,
                         dcn_shift_budget=self.dcn_shift_budget,
                         dtype=self.dtype,
                         name='update_feat_conv')(feat, train)
        feat = feat + upd

        sampling_offset = nn.Conv(J * Hd * 2, (1, 1), dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(1e-2),
                                  name='sampling_offset')(feat)
        sampling_conf = nn.Conv(J * D, (1, 1), dtype=self.dtype,
                                name='sampling_conf')(feat)
        offset_weight = nn.sigmoid(
            nn.Conv(J * D, (1, 1), dtype=self.dtype,
                    name='update_weight')(feat))
        next_offset = nn.Conv(J * D, (1, 1), dtype=self.dtype,
                              name='update_offset_value')(feat)
        offset = (1.0 - offset_weight) * offset + offset_weight * next_offset
        return feat, offset, sampling_offset, sampling_conf


class RecursiveUpdateLayer(nn.Module):
    num_joints: int
    num_heads: int
    dim: int = 3
    gather_mode: str = 'auto'
    dcn_gather_mode: str = 'patch'
    dcn_train_gather_mode: str = 'auto'
    dcn_shift_radius: int = 2
    dcn_shift_budget: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, prev_offset: jnp.ndarray,
                 train: bool = False, select_idx=None):
        feat, offset, samp_off, samp_conf = NextLevelOffset(
            num_joints=self.num_joints, num_heads=self.num_heads,
            dim=self.dim, dcn_gather_mode=self.dcn_gather_mode,
            dcn_train_gather_mode=self.dcn_train_gather_mode,
            dcn_shift_radius=self.dcn_shift_radius,
            dcn_shift_budget=self.dcn_shift_budget, dtype=self.dtype,
            name='next_level_offset')(feat, prev_offset, train)
        if select_idx is None:
            new_offset = _offset_sample(
                offset, samp_off, samp_conf, self.num_joints,
                self.num_heads, self.dim, gather_mode=self.gather_mode,
                train=train)
            return feat, new_offset
        # sparse eval path: refine only the selected points; the dense
        # gated field is returned as the scatter base for the rest
        refined = _offset_sample_sparse(
            offset, samp_off, samp_conf, select_idx, self.num_joints,
            self.num_heads, self.dim, gather_mode=self.gather_mode,
            train=train)
        return feat, (offset, refined)


class RecursiveUpdateBranch(nn.Module):
    """1x1 reduction + stacked refinement layers (ref :238-255).

    At eval, ``select_idx`` (N, K) restricts the LAST layer's offset
    re-sampling to the given flat spatial points (the decode's own
    top-``nms_pre`` candidates); earlier layers stay dense because the
    next layer's gated update consumes the full refined field. The
    return value is then ``(dense_base_field, (N, K, J*dim) refined)``.
    """
    num_joints: int
    num_heads: int = 4
    in_channels: int = 256
    feat_channels: int = 256
    num_layers: int = 1
    dim: int = 3
    prev_loss: bool = True       # consumed by the loss, kept for config parity
    remat: bool = False          # rematerialise each layer under grad
    gather_mode: str = 'auto'    # gather lowering for the offset sampling
    dcn_gather_mode: str = 'patch'   # tap-fetch lowering for the DCN convs
    dcn_train_gather_mode: str = 'auto'
    dcn_shift_radius: int = 2
    dcn_shift_budget: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, offset: jnp.ndarray,
                 train: bool = False, select_idx=None):
        layer_cls = nn.remat(RecursiveUpdateLayer, static_argnums=(3,)) \
            if self.remat else RecursiveUpdateLayer
        feat = ConvModule(self.feat_channels, 1, 1, 0,
                          norm_cfg=dict(type='GN', num_groups=32),
                          dtype=self.dtype, name='reduction')(feat, train)
        for i in range(self.num_layers):
            sel = select_idx if i == self.num_layers - 1 else None
            feat, offset = layer_cls(
                num_joints=self.num_joints, num_heads=self.num_heads,
                dim=self.dim, gather_mode=self.gather_mode,
                dcn_gather_mode=self.dcn_gather_mode,
                dcn_train_gather_mode=self.dcn_train_gather_mode,
                dcn_shift_radius=self.dcn_shift_radius,
                dcn_shift_budget=self.dcn_shift_budget,
                dtype=self.dtype,
                name=f'layer_{i}')(feat, offset, train, sel)
        return offset
