"""Distribution-aware single-stage pose head (TPU/flax rebuild).

Rebuilds the reference ``DASHead``
(ref: mmdet3d/models/pose_heads/das_head.py:31-267 and its base
anchor_free_mono3d_pose_head.py:13-249): an FCOS-style anchor-free
multi-level head predicting, per location,

  * cls score (1), centerness (1),
  * root xy-offset (2), root depth (1),
  * per-joint uvd (3J) and per-joint sigma (3J),

with per-level learnable ``Scale`` factors per prediction group, a shared
recursive-update refinement branch, and RealNVP flows used by the RLE loss.

Output layout per level (NHWC): cls (N,H,W,1), pose_pred (N,H,W,3+6J),
centerness (N,H,W,1), ref_uvd (N,H,W,3J). Channel order inside pose_pred
matches the reference: [dx, dy, depth, uvd..., sigma...].

Depth specialties preserved exactly (ref das_head.py:246-262): the root
joint's dz is pinned to 0 and its sigma to 1; at inference the refined uvd
replaces the raw one, depth is divided by ``depth_factor``, uv are scaled by
the level stride and z by ``z_norm``.

The training loss lives in ``loss()`` below (a module method so it can run
the flows); target assignment is a pure function in das_tpu/core/targets.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import HEADS
from ..losses.common import (binary_cross_entropy, sigmoid_focal_loss,
                             smooth_l1_loss)
from ..losses.rle_loss import rle_loss
from .layers import ConvModule, Scale
from .real_nvp import RealNVP
from .recursive_update import RecursiveUpdateBranch

Dtype = Any
INF = 1e8


def level_points(h: int, w: int, stride: int, dtype=jnp.float32):
    """Grid points of one level: (h*w, 2) xy, ref das_head.py:269-279."""
    ys, xs = np.mgrid[0:h, 0:w]
    pts = np.stack([xs.reshape(-1) * stride, ys.reshape(-1) * stride],
                   axis=-1) + stride // 2
    return jnp.asarray(pts, dtype)


@HEADS.register_module()
class DASHead(nn.Module):
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    strides: Sequence[int] = (8, 16, 32, 64)
    regress_ranges: Sequence[Tuple[float, float]] = (
        (-1, 80), (80, 160), (160, 320), (320, 1e8))
    num_joints: int = 15
    root_idx: int = 2
    depth_factor: float = 1.0
    z_norm: float = 1.0
    center_sample_radius: float = 1.5
    centerness_on_reg: bool = True
    centerness_branch: Sequence[int] = (64,)
    centerness_alpha: float = 2.5
    cls_branch: Sequence[int] = (256,)
    reg_branch: Sequence[Sequence[int]] = ((256,), (256,), (256,), (256,))
    dcn_on_last_conv: bool = True
    # DCN tap-fetch lowering for the tower convs ('patch'/'clip'/'fill'/
    # 'one_hot' are bit-equal; 'shift' is the gather-free streaming mode,
    # exact while learned offsets stay within +-dcn_shift_radius px)
    dcn_gather_mode: str = 'patch'
    dcn_train_gather_mode: str = 'auto'
    dcn_shift_radius: int = 2
    dcn_shift_budget: int = 2048
    # eval-only fused conv+GN+relu tower kernel (ops/pallas_convgn)
    fused_gn: bool = False
    conv_bias: Any = True
    norm_cfg: Optional[dict] = None
    recursive_update: Optional[dict] = None
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_reg: Optional[dict] = None
    loss_pose: Optional[dict] = None
    loss_centerness: Optional[dict] = None
    background_label: Optional[int] = None
    remat: bool = False    # rematerialise per-level forward under grad
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @property
    def group_reg_dims(self):
        return (2, 1, self.num_joints * 3, self.num_joints * 3)

    @property
    def bg_label(self):
        return self.num_classes if self.background_label is None \
            else self.background_label

    def setup(self):
        norm_cfg = self.norm_cfg or dict(type='GN', num_groups=32)
        # reference head init: Normal(std=0.01) on every Conv2d, with the
        # cls conv's bias set to the focal prior
        # (ref anchor_free_mono3d_pose_head.py:92-98, das_head.py:86-92)
        init01 = nn.initializers.normal(0.01)
        kw = dict(norm_cfg=norm_cfg, bias=self.conv_bias, dtype=self.dtype,
                  axis_name=self.axis_name, kernel_init=init01,
                  dcn_gather_mode=self.dcn_gather_mode,
                  dcn_train_gather_mode=self.dcn_train_gather_mode,
                  dcn_shift_radius=self.dcn_shift_radius,
                  dcn_shift_budget=self.dcn_shift_budget,
                  fused_gn=self.fused_gn)
        # fine-grained remat: each ConvModule is its own region, so the
        # backward holds one conv's activations at a time (level-level
        # remat still peaked >16G at B=4 512x960)
        CM = nn.remat(ConvModule, static_argnums=(2,)) if self.remat \
            else ConvModule

        def tower():
            mods = []
            for i in range(self.stacked_convs):
                dcn = self.dcn_on_last_conv and i == self.stacked_convs - 1
                mods.append(CM(self.feat_channels, 3, 1, 1,
                               dcn=dcn, **kw))
            return mods

        self.cls_convs = tower()
        self.reg_convs = tower()
        self.pose_convs = tower()

        def branch(channels):
            return [CM(c, 3, 1, 1, **kw) for c in channels]

        bias_prob = 0.01
        cls_bias = float(-math.log((1 - bias_prob) / bias_prob))
        self.conv_cls_prev = branch(self.cls_branch)
        self.conv_cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                                kernel_init=init01,
                                bias_init=nn.initializers.constant(cls_bias))
        self.conv_reg_prevs = [branch(self.reg_branch[i]) for i in range(2)]
        self.conv_regs = [nn.Conv(self.group_reg_dims[i], (1, 1),
                                  kernel_init=init01,
                                  dtype=self.dtype) for i in range(2)]
        self.conv_pose_prevs = [branch(self.reg_branch[i])
                                for i in range(2, 4)]
        self.conv_poses = [nn.Conv(self.group_reg_dims[i], (1, 1),
                                   kernel_init=init01,
                                   dtype=self.dtype) for i in range(2, 4)]
        self.conv_centerness_prev = branch(self.centerness_branch)
        self.conv_centerness = nn.Conv(1, (1, 1), kernel_init=init01,
                                       dtype=self.dtype)
        self.scales = [[Scale(1.0) for _ in range(4)] for _ in self.strides]

        ru = dict(self.recursive_update or {})
        ru.setdefault('num_joints', self.num_joints)
        ru.setdefault('remat', self.remat)
        ru.setdefault('dcn_gather_mode', self.dcn_gather_mode)
        ru.setdefault('dcn_train_gather_mode', self.dcn_train_gather_mode)
        ru.setdefault('dcn_shift_radius', self.dcn_shift_radius)
        ru.setdefault('dcn_shift_budget', self.dcn_shift_budget)
        self.recursive_update_branch = RecursiveUpdateBranch(
            dtype=self.dtype, **ru)
        self.prev_loss = ru.get('prev_loss', False)

        self.flow3d = RealNVP(dim=3)
        self.flow2d = RealNVP(dim=2)
        self.flow3d_update = RealNVP(dim=3)
        self.flow2d_update = RealNVP(dim=2)

    # ----------------------------------------------------------- forward
    def _run(self, mods, x, train):
        for m in mods:
            x = m(x, train)
        return x

    def forward_single(self, x: jnp.ndarray, lvl: int, train: bool,
                       select_idx=None):
        J = self.num_joints
        stride = self.strides[lvl]

        cls_feat = self._run(self.cls_convs, x, train)
        cls_score = self.conv_cls(
            self._run(self.conv_cls_prev, cls_feat, train))

        reg_feat = self._run(self.reg_convs, x, train)
        pose_feat = self._run(self.pose_convs, x, train)

        preds = []
        for i in range(4):
            feat = reg_feat if i < 2 else pose_feat
            prevs = self.conv_reg_prevs[i] if i < 2 \
                else self.conv_pose_prevs[i - 2]
            head = self.conv_regs[i] if i < 2 else self.conv_poses[i - 2]
            preds.append(head(self._run(prevs, feat, train)))

        if self.centerness_on_reg:
            centerness = self.conv_centerness(
                self._run(self.conv_centerness_prev, reg_feat, train))
        else:
            centerness = self.conv_centerness(
                self._run(self.conv_centerness_prev, cls_feat, train))

        s_off, s_depth, s_uv, s_d = self.scales[lvl]
        offset = s_off(preds[0]).astype(jnp.float32)
        depth = s_depth(preds[1]).astype(jnp.float32)
        uvd = preds[2].astype(jnp.float32).reshape(*preds[2].shape[:3], J, 3)
        uvd = jnp.concatenate(
            [s_uv(uvd[..., :2]), s_d(uvd[..., 2:])], axis=-1)
        sigma = preds[3].astype(jnp.float32)

        # relative root depth pinned to 0 / sigma 1 (ref das_head.py:249-250)
        uvd = uvd.at[..., self.root_idx, 2].set(0.0)
        sigma = sigma.reshape(*sigma.shape[:3], J, 3)
        sigma = sigma.at[..., self.root_idx, 2].set(1.0)
        sigma = sigma.reshape(*sigma.shape[:3], J * 3)

        uvd_flat = uvd.reshape(*uvd.shape[:3], J * 3)

        # Sparse eval refinement (test_cfg.sparse_refine): the decode
        # keeps at most nms_pre candidates per level, ranked by
        # score*centerness — which this branch does not influence — so
        # the offset re-sampling only needs to run at those points
        # (level-0 of the 640x1152 eval shape is 691k points per image
        # vs nms_pre=1000; the dense sampling was 77% of the measured
        # inference step). Decode outputs are bitwise identical: the
        # head selects with the same key, the same k and the same
        # jax.lax.top_k as core/decode.decode_single_image.
        # In training, ``select_idx`` arrives from DAS.loss as the
        # assigned positive points (train_cfg.sparse_refine) — losses and
        # gradients are bitwise the dense ones (see DAS.loss docstring).
        test_cfg = dict(self.test_cfg or {})
        N, Hf, Wf = cls_score.shape[:3]
        nms_pre = int(test_cfg.get('nms_pre', 1000))
        if self.recursive_update_branch.num_layers == 0:
            select_idx = None
        if select_idx is None and (not train) \
                and bool(test_cfg.get('sparse_refine', False)) \
                and self.recursive_update_branch.num_layers > 0 \
                and Hf * Wf > nms_pre:
            ranked = (jax.nn.sigmoid(cls_score.astype(jnp.float32))
                      * jax.nn.sigmoid(centerness.astype(jnp.float32)))
            ranked = ranked.reshape(N, Hf * Wf)
            _, select_idx = jax.lax.top_k(ranked, nms_pre)
        sparse = select_idx is not None

        ref_out = self.recursive_update_branch(
            pose_feat, uvd_flat.astype(self.dtype), train, select_idx)
        if sparse:
            base, refined = ref_out
            nidx = jnp.arange(N)[:, None]
            ref_uvd = base.astype(jnp.float32).reshape(N, Hf * Wf, J * 3) \
                .at[nidx, select_idx].set(refined.astype(jnp.float32)) \
                .reshape(N, Hf, Wf, J * 3)
        else:
            ref_uvd = ref_out.astype(jnp.float32)
        ref_uvd = ref_uvd.reshape(*ref_uvd.shape[:3], J, 3)
        ref_uvd = ref_uvd.at[..., self.root_idx, 2].set(0.0)

        if not train:
            # eval path: fold refined uvd in + rescale (ref :256-262)
            out_uvd = ref_uvd * jnp.asarray(
                [stride, stride, self.z_norm], jnp.float32)
            depth = depth / self.depth_factor
            pose_pred = jnp.concatenate(
                [offset, depth, out_uvd.reshape(*out_uvd.shape[:3], J * 3),
                 sigma], axis=-1)
        else:
            pose_pred = jnp.concatenate(
                [offset, depth, uvd_flat, sigma], axis=-1)

        ref_flat = ref_uvd.reshape(*ref_uvd.shape[:3], J * 3)
        return cls_score.astype(jnp.float32), pose_pred, \
            centerness.astype(jnp.float32), ref_flat

    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False,
                 select_idx=None):
        outs = [self.forward_single(
                    f, i, train,
                    None if select_idx is None else select_idx[i])
                for i, f in enumerate(feats)]
        cls_scores, pose_preds, centernesses, ref_uvds = zip(*outs)
        return list(cls_scores), list(pose_preds), list(centernesses), \
            list(ref_uvds)

    # -------------------------------------------------------------- loss
    def loss(self,
             cls_scores: Sequence[jnp.ndarray],
             pose_preds: Sequence[jnp.ndarray],
             centernesses: Sequence[jnp.ndarray],
             aux_pose_preds: Sequence[jnp.ndarray],
             targets: Dict[str, jnp.ndarray],
             max_pos: int = 1024) -> Dict[str, jnp.ndarray]:
        """Training loss (ref das_head.py:283-486), fixed-shape.

        ``targets`` comes from das_tpu.core.targets.get_targets and holds
        flattened per-point labels / pose targets / centerness targets /
        strides over all levels and batch images.
        """
        J = self.num_joints
        num_imgs = cls_scores[0].shape[0]

        flat_cls = jnp.concatenate(
            [c.reshape(-1, self.num_classes) for c in cls_scores])
        flat_pose = jnp.concatenate(
            [p.reshape(-1, 3 + 6 * J) for p in pose_preds])
        flat_ctr = jnp.concatenate(
            [c.reshape(-1) for c in centernesses])
        flat_aux = jnp.concatenate(
            [a.reshape(-1, 3 * J) for a in aux_pose_preds])

        labels = targets['labels']                  # (T,)
        pose_t = targets['pose_targets']            # (T, 3 + 4J)
        ctr_t = targets['centerness_targets']       # (T,)
        strides_t = targets['strides']              # (T,)

        pos_mask = labels < self.bg_label
        num_pos = pos_mask.sum()

        loss_cls = sigmoid_focal_loss(
            flat_cls, labels, avg_factor=num_pos + num_imgs)

        # ---- gather a fixed-size positive set ---------------------------
        T = labels.shape[0]
        k = min(max_pos, T)
        # order positives first (stable by construction of top_k over 0/1)
        pos_score = jnp.where(pos_mask, 1.0, 0.0)
        _, pos_idx = jax.lax.top_k(pos_score, k)
        sel = pos_mask[pos_idx]                     # (k,) validity
        selF = sel.astype(jnp.float32)

        p_pose = flat_pose[pos_idx]
        p_aux = flat_aux[pos_idx].reshape(k, J, 3)
        p_ctr = flat_ctr[pos_idx]
        p_t = pose_t[pos_idx]
        p_ctr_t = ctr_t[pos_idx]
        p_strides = strides_t[pos_idx]

        code_weight = None
        if self.train_cfg and self.train_cfg.get('code_weight'):
            code_weight = jnp.asarray(self.train_cfg['code_weight'],
                                      jnp.float32)

        gt_uvd_full = p_t[:, 3:3 + 3 * J]
        is_2d = jnp.all(gt_uvd_full[:, 2::3] == 0, axis=1)
        is_3d = jnp.logical_not(is_2d) & sel

        # ---- depth loss (3D positives only, ref :366-381) ----------------
        depth_w = jnp.where(is_3d, 1.0, 0.0)
        cw_depth = code_weight[2] if code_weight is not None else 1.0
        loss_depth = smooth_l1_loss(
            p_pose[:, 2], p_t[:, 2] * self.depth_factor,
            weight=depth_w * cw_depth,
            avg_factor=jnp.maximum(depth_w.sum(), 1.0))
        loss_depth = jnp.where(is_3d.sum() > 0, loss_depth, 0.0)

        # ---- RLE pose loss ------------------------------------------------
        uvd = p_pose[:, 3:3 + 3 * J].reshape(k, J, 3)
        sigma = p_pose[:, 3 + 3 * J:].reshape(k, J, 3)
        uvd_update = p_aux

        # 2D samples carry no depth (ref :387-390)
        uvd = jnp.where(is_2d[:, None, None],
                        uvd.at[..., 2].set(0.0), uvd)
        uvd_update = jnp.where(is_2d[:, None, None],
                               uvd_update.at[..., 2].set(0.0), uvd_update)
        # the reference pins the RAW sigma-z to 1 for 2D samples before the
        # sigmoid (ref :390,409) -> sigma_z == sigmoid(1) + 1e-9
        sigma_raw = jnp.where(is_2d[:, None, None],
                              sigma.at[..., 2].set(1.0), sigma)
        sigma = jax.nn.sigmoid(sigma_raw) + 1e-9

        # root-to-joint -> point-to-joint targets (ref :392-406)
        diff = p_t[:, :3] * p_strides[:, None]
        diff = diff.at[:, 2].set(0.0)
        real_gt = gt_uvd_full.reshape(k, J, 3) - diff[:, None, :]
        real_gt = real_gt.at[..., :2].multiply(
            1.0 / p_strides[:, None, None])
        real_gt = real_gt.at[..., 2].multiply(1.0 / self.z_norm)
        gt_w = p_t[:, 3 + 3 * J:].reshape(k, J, 1) * selF[:, None, None]
        gt_w = jnp.broadcast_to(gt_w, (k, J, 3))

        def flow_logphi(bar_mu, f3d, f2d):
            lp3 = f3d(bar_mu.reshape(-1, 3)).reshape(k, J)
            lp2 = f2d(bar_mu[..., :2].reshape(-1, 2)).reshape(k, J)
            return jnp.where(is_2d[:, None], lp2, lp3)

        if self.prev_loss:
            bar_mu_upd = (uvd_update - real_gt) / sigma
            bar_mu_raw = (uvd - real_gt) / sigma
            lp_upd = flow_logphi(bar_mu_upd, self.flow3d_update,
                                 self.flow2d_update)
            lp_raw = flow_logphi(bar_mu_raw, self.flow3d, self.flow2d)
            uvd_all = jnp.concatenate([uvd_update, uvd], axis=1)
            real_gt_all = jnp.tile(real_gt, (1, 2, 1))
            sigma_all = jnp.tile(sigma, (1, 2, 1))
            gt_w_all = jnp.tile(gt_w, (1, 2, 1))
            log_phi = jnp.concatenate([lp_upd, lp_raw], axis=1)[..., None]
        else:
            bar_mu = (uvd_update - real_gt) / sigma
            log_phi = flow_logphi(bar_mu, self.flow3d,
                                  self.flow2d)[..., None]
            uvd_all, real_gt_all, sigma_all, gt_w_all = \
                uvd_update, real_gt, sigma, gt_w

        nf_loss = jnp.log(sigma_all) - log_phi
        cw_pose = code_weight[3] if code_weight is not None else 1.0
        loss_pose = rle_loss(nf_loss, uvd_all, sigma_all, real_gt_all,
                             gt_w_all, weight=cw_pose)

        # ---- centerness (ref :470) ---------------------------------------
        loss_ctr = binary_cross_entropy(p_ctr, p_ctr_t, weight=selF)

        has_pos = (num_pos > 0).astype(jnp.float32)
        return dict(loss_cls=loss_cls,
                    loss_depth=loss_depth * has_pos,
                    loss_pose=loss_pose * has_pos,
                    loss_centerness=loss_ctr * has_pos,
                    # positives silently dropped by the fixed max_pos
                    # gather (0 when the budget is large enough); surfaced
                    # as a train metric so truncation is observable
                    pos_overflow=jnp.maximum(
                        num_pos - k, 0).astype(jnp.float32))
