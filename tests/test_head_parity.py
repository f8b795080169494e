"""DASHead forward parity against a torch mirror through the bridge.

Builds a tiny head in plain torch with the reference's module/key layout
(das_head.py towers + scales + recursive update; DCNv2 realised with
F.grid_sample so mmcv semantics hold), exports its state_dict, loads it
into the flax DASHead via the checkpoint bridge, and compares the
eval-mode per-level outputs. Covers the wiring the op-level tests can't:
group layout, scale application, root pinning, eval rescaling, and the
multi-head offset re-sampling."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from das_tpu.checkpoint.torch_bridge import (convert_state_dict,
                                             merge_into_variables)
from das_tpu.models.das_head import DASHead

C, J, HEADS = 32, 4, 2
STRIDE = 8


def grid_from_abs(px, py, h, w):
    """Absolute pixel coords -> grid_sample normalized grid (B,H,W,2)."""
    gx = (2 * px + 1) / w - 1
    gy = (2 * py + 1) / h - 1
    return torch.stack([gx, gy], dim=-1)


class TDCN(nn.Module):
    """mmcv ModulatedDeformConv2dPack forward via grid_sample."""

    def __init__(self, cin, cout, bias=True):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(cout, cin, 3, 3) * 0.1)
        self.bias = nn.Parameter(torch.randn(cout) * 0.1) if bias else None
        self.conv_offset = nn.Conv2d(cin, 27, 3, padding=1)
        nn.init.normal_(self.conv_offset.weight, 0, 0.05)
        nn.init.normal_(self.conv_offset.bias, 0, 0.05)

    def forward(self, x):
        b, cin, h, w = x.shape
        raw = self.conv_offset(x)
        offset, mask = raw[:, :18], torch.sigmoid(raw[:, 18:])
        ys = torch.arange(h, dtype=torch.float32).view(1, h, 1)
        xs = torch.arange(w, dtype=torch.float32).view(1, 1, w)
        taps = []
        for k in range(9):
            ky, kx = divmod(k, 3)
            py = ys + (ky - 1) + offset[:, 2 * k]
            px = xs + (kx - 1) + offset[:, 2 * k + 1]
            g = grid_from_abs(px, py, h, w)
            t = F.grid_sample(x, g, mode='bilinear', padding_mode='zeros',
                              align_corners=False)
            taps.append(t * mask[:, k:k + 1])
        out = 0
        for k in range(9):
            ky, kx = divmod(k, 3)
            wk = self.weight[:, :, ky, kx]              # (cout, cin)
            out = out + torch.einsum('bchw,oc->bohw', taps[k], wk)
        if self.bias is not None:
            out = out + self.bias.view(1, -1, 1, 1)
        return out


class TConvModule(nn.Module):
    def __init__(self, cin, cout, k=3, dcn=False, bias=True, act=True):
        super().__init__()
        if dcn:
            self.conv = TDCN(cin, cout, bias=bias)
        else:
            self.conv = nn.Conv2d(cin, cout, k, padding=k // 2, bias=bias)
        self.gn = nn.GroupNorm(32, cout)
        self.act = act

    def forward(self, x):
        x = self.gn(self.conv(x))
        return F.relu(x) if self.act else x


class TScale(nn.Module):
    def __init__(self):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(
            1.0 + 0.1 * torch.randn(()).item()))

    def forward(self, x):
        return x * self.scale


class TNextLevelOffset(nn.Module):
    def __init__(self):
        super().__init__()
        self.sampling_offset = nn.Conv2d(C, J * HEADS * 2, 1)
        self.sampling_conf = nn.Conv2d(C, J * 3, 1)
        self.update_feat_conv = TConvModule(C, C, dcn=True, bias=False)
        self.update_weight = nn.Conv2d(C, J * 3, 1)
        self.update_offset_value = nn.Conv2d(C, J * 3, 1)
        nn.init.normal_(self.sampling_offset.weight, 0, 1e-2)
        nn.init.constant_(self.sampling_offset.bias, 0)

    def forward(self, feat, offset):
        feat = feat + self.update_feat_conv(feat)
        so = self.sampling_offset(feat)
        sc = self.sampling_conf(feat)
        w = torch.sigmoid(self.update_weight(feat))
        nxt = self.update_offset_value(feat)
        offset = (1 - w) * offset + w * nxt
        return feat, offset, so, sc


def t_offset_sample(uvd, samp_off, conf):
    """Reference offset_sample semantics (recursive_update.py:9-82)."""
    b, _, h, w = uvd.shape
    ys = torch.arange(h, dtype=torch.float32).view(1, h, 1) + 0.5
    xs = torch.arange(w, dtype=torch.float32).view(1, 1, w) + 0.5

    uvd_j = uvd.reshape(b * J, 3, h, w)
    off_t = uvd_j[:, :2]
    samp_j = samp_off.reshape(b * J, HEADS * 2, h, w)
    conf_j = conf.reshape(b * J, 3, h, w)

    # heads sampled at the predicted target location
    tx = xs + off_t[:, 0] - 0.5
    ty = ys + off_t[:, 1] - 0.5
    g = grid_from_abs(tx, ty, h, w)
    from_target = F.grid_sample(samp_j, g, mode='bilinear',
                                padding_mode='zeros', align_corners=False)
    from_target = from_target.reshape(b * J, HEADS, 2, h, w) + \
        off_t.unsqueeze(1)
    from_source = samp_j.reshape(b * J, HEADS, 2, h, w)
    cand = torch.cat([from_target, from_source], 1)       # (bJ, 2H, 2,h,w)

    feat = torch.cat([uvd_j, conf_j], 1)                  # (bJ, 6, h, w)
    outs = []
    for c in range(2 * HEADS):
        sx = xs + cand[:, c, 0] - 0.5
        sy = ys + cand[:, c, 1] - 0.5
        g = grid_from_abs(sx, sy, h, w)
        s = F.grid_sample(feat, g, mode='bilinear', padding_mode='zeros',
                          align_corners=False)            # (bJ, 6, h, w)
        diff = torch.cat([cand[:, c],
                          torch.zeros_like(cand[:, c, :1])], 1)
        outs.append((s[:, :3] + diff, s[:, 3:]))
    samp_uvd = torch.stack([o[0] for o in outs], 1)       # (bJ,2H,3,h,w)
    samp_conf = torch.stack([o[1] for o in outs], 1)
    wgt = torch.softmax(samp_conf, dim=1)
    fused = (samp_uvd * wgt).sum(1)                       # (bJ, 3, h, w)
    return fused.reshape(b, J * 3, h, w)


class THead(nn.Module):
    """Reference-layout tiny DASHead (single level)."""

    def __init__(self):
        super().__init__()
        def tower():
            return nn.ModuleList([TConvModule(C, C),
                                  TConvModule(C, C, dcn=True)])
        self.cls_convs = tower()
        self.reg_convs = tower()
        self.pose_convs = tower()
        self.conv_cls_prev = nn.ModuleList([TConvModule(C, C)])
        self.conv_cls = nn.Conv2d(C, 1, 1)
        self.conv_reg_prevs = nn.ModuleList(
            [nn.ModuleList([TConvModule(C, C)]) for _ in range(2)])
        self.conv_regs = nn.ModuleList(
            [nn.Conv2d(C, d, 1) for d in (2, 1)])
        self.conv_pose_prevs = nn.ModuleList(
            [nn.ModuleList([TConvModule(C, C)]) for _ in range(2)])
        self.conv_poses = nn.ModuleList(
            [nn.Conv2d(C, 3 * J, 1) for _ in range(2)])
        self.conv_centerness_prev = nn.ModuleList([TConvModule(C, C)])
        self.conv_centerness = nn.Conv2d(C, 1, 1)
        self.scales = nn.ModuleList(
            [nn.ModuleList([TScale() for _ in range(4)])])
        ru = nn.Module()
        ru.reduction = TConvModule(C, C, k=1, bias=False)
        layer = nn.Module()
        layer.next_level_offset = TNextLevelOffset()
        ru.add_module('layer_0', layer)
        self.recursive_update_branch = ru

    def forward(self, x, depth_factor, z_norm, root_idx):
        def run(mods, x):
            for m in mods:
                x = m(x)
            return x
        cls_feat = run(self.cls_convs, x)
        cls = self.conv_cls(run(self.conv_cls_prev, cls_feat))
        reg_feat = run(self.reg_convs, x)
        pose_feat = run(self.pose_convs, x)
        preds = []
        for i in range(2):
            preds.append(self.conv_regs[i](
                run(self.conv_reg_prevs[i], reg_feat)))
        for i in range(2):
            preds.append(self.conv_poses[i](
                run(self.conv_pose_prevs[i], pose_feat)))
        ctr = self.conv_centerness(
            run(self.conv_centerness_prev, reg_feat))

        s_off, s_depth, s_uv, s_d = self.scales[0]
        offset = s_off(preds[0])
        depth = s_depth(preds[1])
        uvd = preds[2].clone()
        uvd[:, 0::3] = s_uv(preds[2][:, 0::3])
        uvd[:, 1::3] = s_uv(preds[2][:, 1::3])
        uvd[:, 2::3] = s_d(preds[2][:, 2::3])
        sigma = preds[3].clone()
        uvd[:, root_idx * 3 + 2] = 0
        sigma[:, root_idx * 3 + 2] = 1

        feat = self.recursive_update_branch.reduction(pose_feat)
        feat, off2, so, sc = \
            self.recursive_update_branch.layer_0.next_level_offset(
                feat, uvd)
        ref = t_offset_sample(off2, so, sc)
        ref[:, root_idx * 3 + 2] = 0

        # eval path (das_head.py:256-262)
        out_uvd = ref.clone()
        out_uvd[:, 0::3] *= STRIDE
        out_uvd[:, 1::3] *= STRIDE
        out_uvd[:, 2::3] *= z_norm
        depth = depth / depth_factor
        pose = torch.cat([offset, depth, out_uvd, sigma], 1)
        return cls, pose, ctr, ref


@pytest.mark.slow
def test_head_forward_parity():
    torch.manual_seed(1)
    thead = THead().eval()
    x = torch.randn(2, C, 8, 8)
    with torch.no_grad():
        t_cls, t_pose, t_ctr, t_ref = thead(x, depth_factor=20.0,
                                            z_norm=50.0, root_idx=2)

    jhead = DASHead(
        num_classes=1, in_channels=C, feat_channels=C, stacked_convs=2,
        strides=(STRIDE,), regress_ranges=((-1, 1e8),), num_joints=J,
        root_idx=2, depth_factor=20.0, z_norm=50.0,
        cls_branch=(C,), reg_branch=((C,), (C,), (C,), (C,)),
        centerness_branch=(C,),
        recursive_update=dict(prev_loss=True, num_heads=HEADS,
                              in_channels=C, feat_channels=C,
                              num_layers=1, dim=3))
    feats = [jnp.asarray(x.permute(0, 2, 3, 1).numpy())]
    variables = jhead.init(jax.random.PRNGKey(0), feats, False)

    sd = {'bbox_head.' + k: v.numpy() for k, v in
          thead.state_dict().items()}
    # the flax head tree has no 'bbox_head' prefix when built standalone
    sd = {k[len('bbox_head.'):]: v for k, v in sd.items()}
    params, stats, _ = convert_state_dict(sd)
    new_vars, report = merge_into_variables(dict(variables), params, stats,
                                            strict=False)
    assert report['unexpected'] == [], report['unexpected'][:8]

    cls, pose, ctr, ref = jhead.apply(new_vars, feats, False)
    np.testing.assert_allclose(np.asarray(cls[0]).transpose(0, 3, 1, 2),
                               t_cls.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ctr[0]).transpose(0, 3, 1, 2),
                               t_ctr.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref[0]).transpose(0, 3, 1, 2),
                               t_ref.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pose[0]).transpose(0, 3, 1, 2),
                               t_pose.numpy(), rtol=1e-3, atol=2e-3)
