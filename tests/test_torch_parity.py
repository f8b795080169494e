"""End-to-end numerical parity of the MSPN backbone + FPN against a torch
mirror loaded through the checkpoint bridge.

Builds the reference architecture in plain torch (same module/key layout as
mspn_mmpose.py / mmdet FPN), exports its state_dict, loads it into the flax
model via das_tpu.checkpoint.torch_bridge, and checks the eval-mode forward
outputs agree. This is the per-layer parity harness SURVEY.md §7 step 2
calls for, minus the unavailable released checkpoint.
"""

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
from das_tpu.models import build_model

NUM_STAGES = 2
NUM_BLOCKS = [1, 1, 1, 1]


# --------------------------------------------------------------- torch ref

class TBottleneck(nn.Module):
    def __init__(self, cin, mid, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, mid * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(mid * 4)
        self.downsample = None
        if stride != 1 or cin != mid * 4:
            self.downsample = nn.Sequential()
            self.downsample.add_module('conv', nn.Conv2d(
                cin, mid * 4, 1, stride, bias=False))
            self.downsample.add_module('bn', nn.BatchNorm2d(mid * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


def conv_bn(cin, cout, k=1, stride=1, pad=0, act=False):
    mods = nn.Sequential()
    mods.add_module('conv', nn.Conv2d(cin, cout, k, stride, pad,
                                      bias=False))
    mods.add_module('bn', nn.BatchNorm2d(cout))
    if act:
        mods.add_module('activate', nn.ReLU())
    return mods


class TDownsample(nn.Module):
    def __init__(self, has_skip):
        super().__init__()
        self.has_skip = has_skip
        cin = 64
        for u in range(4):
            mid = 64 * 2 ** u
            blocks = nn.Sequential()
            for b in range(NUM_BLOCKS[u]):
                blocks.add_module(str(b), TBottleneck(
                    cin, mid, (1 if u == 0 else 2) if b == 0 else 1))
                cin = mid * 4
            setattr(self, f'layer{u + 1}', blocks)

    def forward(self, x, skip1, skip2):
        out = []
        for u in range(4):
            x = getattr(self, f'layer{u + 1}')(x)
            if self.has_skip:
                x = x + skip1[u] + skip2[u]
            out.append(x)
        return out[::-1]


class TUpsampleUnit(nn.Module):
    def __init__(self, ind, cin, gen_skip, gen_cross):
        super().__init__()
        self.ind = ind
        self.in_skip = conv_bn(cin, 256)
        if ind > 0:
            self.up_conv = conv_bn(256, 256)
        self.gen_skip = gen_skip
        if gen_skip:
            self.out_skip1 = conv_bn(cin, cin, act=True)
            self.out_skip2 = conv_bn(256, cin, act=True)
        self.gen_cross = gen_cross
        if ind == 3 and gen_cross:
            self.cross_conv = conv_bn(256, 64, act=True)

    def forward(self, x, up_x):
        out = self.in_skip(x)
        if self.ind > 0:
            up_x = F.interpolate(up_x, size=x.shape[-2:], mode='bilinear',
                                 align_corners=True)
            out = out + self.up_conv(up_x)
        out = F.relu(out)
        skip1 = skip2 = cross = None
        if self.gen_skip:
            skip1 = self.out_skip1(x)
            skip2 = self.out_skip2(out)
        if self.ind == 3 and self.gen_cross:
            cross = self.cross_conv(out)
        return out, skip1, skip2, cross


class TUpsample(nn.Module):
    def __init__(self, gen_skip, gen_cross):
        super().__init__()
        cins = [2048, 1024, 512, 256]
        for i in range(4):
            setattr(self, f'up{i + 1}',
                    TUpsampleUnit(i, cins[i], gen_skip, gen_cross))

    def forward(self, feats):
        out, skip1, skip2 = [], [], []
        cross = None
        for i in range(4):
            o, s1, s2, c = getattr(self, f'up{i + 1}')(
                feats[i], out[i - 1] if i else None)
            out.append(o)
            skip1.append(s1)
            skip2.append(s2)
            if c is not None:
                cross = c
        return out, skip1[::-1], skip2[::-1], cross


class TStage(nn.Module):
    def __init__(self, has_skip, gen_skip, gen_cross):
        super().__init__()
        self.downsample = TDownsample(has_skip)
        self.upsample = TUpsample(gen_skip, gen_cross)

    def forward(self, x, skip1, skip2):
        return self.upsample(self.downsample(x, skip1, skip2))


class TTop(nn.Module):
    def __init__(self):
        super().__init__()
        inner = nn.Sequential()
        inner.add_module('conv', nn.Conv2d(3, 64, 7, 2, 3, bias=False))
        inner.add_module('bn', nn.BatchNorm2d(64))
        inner.add_module('activate', nn.ReLU())
        self.top = nn.Sequential(inner, nn.MaxPool2d(3, 2, 1))

    def forward(self, x):
        return self.top(x)


class TMSPN(nn.Module):
    def __init__(self):
        super().__init__()
        self.top = TTop()
        self.multi_stage_mspn = nn.ModuleList([
            TStage(s != 0, s != NUM_STAGES - 1, s != NUM_STAGES - 1)
            for s in range(NUM_STAGES)])

    def forward(self, x):
        x = self.top(x)
        skip1 = skip2 = None
        outs = None
        for stage in self.multi_stage_mspn:
            outs, skip1, skip2, x = stage(x, skip1, skip2)
        return [o for o in outs[::-1]]


class TFPN(nn.Module):
    def __init__(self):
        super().__init__()
        self.lateral_convs = nn.ModuleList([conv_bn(256, 256)
                                            for _ in range(4)])
        self.fpn_convs = nn.ModuleList([conv_bn(256, 256, 3, 1, 1)
                                        for _ in range(4)])

    def forward(self, feats):
        lats = [l(f) for l, f in zip(self.lateral_convs, feats)]
        for i in range(3, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[-2:], mode='nearest')
        return [f(l) for f, l in zip(self.fpn_convs, lats)]


class TBackboneNeck(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TMSPN()
        self.neck = TFPN()

    def forward(self, x):
        return self.neck(self.backbone(x))


@pytest.mark.slow
def test_backbone_neck_parity_via_bridge():
    torch.manual_seed(0)
    tmodel = TBackboneNeck().eval()
    # randomise BN stats so eval-mode normalisation is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1, 0.1)
                m.bias.normal_(0, 0.1)

    x = torch.randn(1, 3, 64, 96)
    with torch.no_grad():
        t_feats = tmodel(x)

    model_cfg = dict(
        type='DAS',
        backbone=dict(type='MSPN2', unit_channels=256,
                      num_stages=NUM_STAGES, num_units=4,
                      num_blocks=NUM_BLOCKS, norm_cfg=dict(type='BN')),
        neck=dict(type='FPN', in_channels=[256] * 4, out_channels=256,
                  norm_cfg=dict(type='BN'), num_outs=4),
        bbox_head=dict(type='DASHead', num_classes=1, in_channels=256,
                       feat_channels=256, num_joints=4, root_idx=2,
                       norm_cfg=dict(type='GN', num_groups=32),
                       recursive_update=dict(num_heads=2, in_channels=256,
                                             feat_channels=256,
                                             num_layers=1, dim=3)),
        test_cfg=dict(nms_pre=10, nms_post=5, nms_thr=0.9, score_thr=0.0),
    )
    model = build_model(model_cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(0), img))

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats, _ = convert_state_dict(sd)
    new_vars, report = merge_into_variables(variables, params, stats,
                                            strict=False)
    # every torch key must land (head params stay at init)
    assert report['unexpected'] == [], report['unexpected'][:6]

    feats = model.apply(new_vars, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy()), False,
        method=type(model).extract_feat)
    for tf, jf in zip(t_feats, feats):
        np.testing.assert_allclose(
            np.asarray(jf).transpose(0, 3, 1, 2), tf.numpy(),
            rtol=1e-3, atol=1e-3)
