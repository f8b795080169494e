"""Measure the PyTorch-CPU throughput baseline for BASELINE.json.

The reference stack itself (mmcv/mmdet/mmdet3d) is not installed in this
image, so this script builds a *structurally exact* pure-torch mirror of
the DAS exp_panoptic model — MSPN 2-stage [3,4,6,3] backbone with
cross-stage skips, 4-level FPN, DAS head towers whose last convs are REAL
DCNv2 (offset conv + per-tap ``F.grid_sample`` + modulation mask, the
semantics of mmcv ``ModulatedDeformConv2dPack``), the 4 prediction
branches + centerness, and the recursive-update branch with its DCN
update conv and the full 2*num_heads-candidate softmax-fused offset
re-sampling — and measures eval forward img/s on CPU at the Panoptic test
bucket (640x1152).

Exclusions (both favour torch, keeping the reported speedup
conservative): the fused decode + OKS-NMS that bench.py's TPU number
includes, and eval-mode norm-folding.

Run:  python tools/torch_cpu_baseline.py [--size 640 1152] [--iters 3]
"""

import argparse
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------- ops
class DCNv2(nn.Module):
    """ModulatedDeformConv2dPack semantics in pure torch (stride 1,
    dilation 1, deform_groups 1): ``conv_offset`` emits (o1, o2, mask)
    chunks; each of the K*K taps samples the input bilinearly at
    ``p + k + offset`` with zeros padding, is modulated by
    ``sigmoid(mask)``, and the stacked taps contract against the kernel.
    Mirrors das_tpu/ops/deform_conv.py (which mirrors mmcv)."""

    def __init__(self, cin, cout, k=3, padding=1, bias=True):
        super().__init__()
        self.k, self.padding = k, padding
        self.conv_offset = nn.Conv2d(cin, 3 * k * k, k, padding=padding)
        nn.init.zeros_(self.conv_offset.weight)
        nn.init.zeros_(self.conv_offset.bias)
        self.weight = nn.Parameter(torch.randn(cout, cin, k, k) * 0.01)
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None

    def forward(self, x):
        B, C, H, W = x.shape
        K, pad = self.k, self.padding
        KK = K * K
        raw = self.conv_offset(x)
        o1, o2, mask = raw.chunk(3, dim=1)
        offset = torch.cat([o1, o2], dim=1)          # (B, 2KK, H, W)
        mask = mask.sigmoid()
        ys = torch.arange(H, dtype=x.dtype).view(1, H, 1)
        xs = torch.arange(W, dtype=x.dtype).view(1, 1, W)
        out = None
        for t in range(KK):
            kh, kw = divmod(t, K)
            sy = ys + (kh - pad) + offset[:, 2 * t]
            sx = xs + (kw - pad) + offset[:, 2 * t + 1]
            # absolute px -> align_corners=True normalized coords
            grid = torch.stack([2 * sx / (W - 1) - 1,
                                2 * sy / (H - 1) - 1], dim=-1)
            tap = F.grid_sample(x, grid, mode='bilinear',
                                padding_mode='zeros', align_corners=True)
            tap = tap * mask[:, t:t + 1]
            r = F.conv2d(tap, self.weight[:, :, kh, kw, None, None])
            out = r if out is None else out + r
        if self.bias is not None:
            out = out + self.bias.view(1, -1, 1, 1)
        return out


def conv_module(cin, cout, k, padding=0, norm='bn', act=True, bias=False,
                dcn=False):
    mods = []
    if dcn:
        mods.append(DCNv2(cin, cout, 3, 1, bias=bias))
    else:
        mods.append(nn.Conv2d(cin, cout, k, padding=padding, bias=bias))
    if norm == 'bn':
        mods.append(nn.BatchNorm2d(cout))
    elif norm == 'gn':
        mods.append(nn.GroupNorm(32, cout))
    if act:
        mods.append(nn.ReLU(inplace=True))
    return nn.Sequential(*mods)


# --------------------------------------------------------------- MSPN
class Bottleneck(nn.Module):
    def __init__(self, cin, mid, stride=1):
        super().__init__()
        self.conv1 = conv_module(cin, mid, 1)
        self.conv2 = nn.Sequential(
            nn.Conv2d(mid, mid, 3, stride, 1, bias=False),
            nn.BatchNorm2d(mid), nn.ReLU(inplace=True))
        self.conv3 = conv_module(mid, mid * 4, 1, act=False)
        self.down = None
        if stride != 1 or cin != mid * 4:
            self.down = nn.Sequential(
                nn.Conv2d(cin, mid * 4, 1, stride, bias=False),
                nn.BatchNorm2d(mid * 4))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        return F.relu(self.conv3(self.conv2(self.conv1(x))) + idt)


class UpsampleUnit(nn.Module):
    def __init__(self, ind, num_units, in_ch, gen_skip, gen_cross):
        super().__init__()
        self.ind = ind
        self.in_skip = conv_module(in_ch, 256, 1, act=False)
        self.up_conv = conv_module(256, 256, 1, act=False) if ind > 0 \
            else None
        self.out_skip1 = conv_module(in_ch, in_ch, 1) if gen_skip else None
        self.out_skip2 = conv_module(256, in_ch, 1) if gen_skip else None
        self.cross_conv = conv_module(256, 64, 1) \
            if ind == num_units - 1 and gen_cross else None

    def forward(self, x, up_x):
        out = self.in_skip(x)
        if self.ind > 0:
            up_x = F.interpolate(up_x, size=x.shape[-2:], mode='bilinear',
                                 align_corners=True)
            out = out + self.up_conv(up_x)
        out = F.relu(out)
        s1 = self.out_skip1(x) if self.out_skip1 is not None else None
        s2 = self.out_skip2(out) if self.out_skip2 is not None else None
        cc = self.cross_conv(out) if self.cross_conv is not None else None
        return out, s1, s2, cc


class Stage(nn.Module):
    def __init__(self, blocks=(3, 4, 6, 3), has_skip=False, gen_skip=True):
        super().__init__()
        self.has_skip = has_skip
        self.units = nn.ModuleList()
        cin = 64
        for u, n in enumerate(blocks):
            mid = 64 * 2 ** u
            mods = [Bottleneck(cin, mid, 1 if u == 0 else 2)]
            cin = mid * 4
            mods += [Bottleneck(cin, mid) for _ in range(n - 1)]
            self.units.append(nn.Sequential(*mods))
        up_in = [2048, 1024, 512, 256]
        self.up = nn.ModuleList([
            UpsampleUnit(i, 4, up_in[i], gen_skip, gen_skip)
            for i in range(4)])

    def forward(self, x, skip1, skip2):
        feats = []
        for u, unit in enumerate(self.units):
            x = unit(x)
            if self.has_skip:
                x = x + skip1[u] + skip2[u]
            feats.append(x)
        feats = feats[::-1]                  # lowest res first
        outs, s1s, s2s, cross = [], [], [], None
        up_prev = None
        for i in range(4):
            o, s1, s2, cc = self.up[i](feats[i], up_prev)
            outs.append(o)
            s1s.append(s1)
            s2s.append(s2)
            up_prev = o
            if cc is not None:
                cross = cc
        return outs, s1s[::-1], s2s[::-1], cross


# --------------------------------------------------- recursive update
def offset_sample(uvd, samp_off, conf, J, heads, dim):
    """Dense multi-head offset re-sampling + softmax fusion
    (das_tpu/models/recursive_update.py:_offset_sample in torch)."""
    B, _, H, W = uvd.shape
    uvd_j = uvd.view(B * J, dim, H, W)
    samp_j = samp_off.view(B * J, heads * 2, H, W)
    conf_j = conf.view(B * J, dim, H, W)
    ys = torch.arange(H, dtype=uvd.dtype).view(1, H, 1) + 0.5
    xs = torch.arange(W, dtype=uvd.dtype).view(1, 1, W) + 0.5

    def sample(field, sx, sy):
        grid = torch.stack([(2 * sx + 1) / W - 1,
                            (2 * sy + 1) / H - 1], dim=-1)
        return F.grid_sample(field, grid, mode='bilinear',
                             padding_mode='zeros', align_corners=False)

    off_to_target = uvd_j[:, :2]
    tx = xs + off_to_target[:, 0] - 0.5
    ty = ys + off_to_target[:, 1] - 0.5
    off_from_target = sample(samp_j, tx, ty).view(B * J, heads, 2, H, W) \
        + off_to_target[:, None]
    off_from_source = samp_j.view(B * J, heads, 2, H, W)
    cand = torch.cat([off_from_target, off_from_source], dim=1)

    field = torch.cat([uvd_j, conf_j], dim=1)
    vals, confs = [], []
    for c in range(2 * heads):
        off_c = cand[:, c]
        s = sample(field, xs + off_c[:, 0] - 0.5, ys + off_c[:, 1] - 0.5)
        d = off_c if dim == 2 else torch.cat(
            [off_c, torch.zeros_like(off_c[:, :1])], dim=1)
        vals.append(s[:, :dim] + d)
        confs.append(s[:, dim:])
    w = torch.softmax(torch.stack(confs, dim=1), dim=1)
    fused = (torch.stack(vals, dim=1) * w).sum(1)
    return fused.view(B, J * dim, H, W)


class RecursiveUpdate(nn.Module):
    def __init__(self, J=15, heads=4, dim=3, ch=256):
        super().__init__()
        self.J, self.heads, self.dim = J, heads, dim
        self.reduction = conv_module(ch, ch, 1, norm='gn')
        self.update_feat_conv = nn.Sequential(
            DCNv2(ch, ch, bias=False), nn.GroupNorm(32, ch),
            nn.ReLU(inplace=True))
        self.sampling_offset = nn.Conv2d(ch, J * heads * 2, 1)
        self.sampling_conf = nn.Conv2d(ch, J * dim, 1)
        self.update_weight = nn.Conv2d(ch, J * dim, 1)
        self.update_offset_value = nn.Conv2d(ch, J * dim, 1)

    def forward(self, feat, offset):
        feat = self.reduction(feat)
        feat = feat + self.update_feat_conv(feat)
        samp_off = self.sampling_offset(feat)
        samp_conf = self.sampling_conf(feat)
        w = self.update_weight(feat).sigmoid()
        offset = (1 - w) * offset + w * self.update_offset_value(feat)
        return offset_sample(offset, samp_off, samp_conf, self.J,
                             self.heads, self.dim)


# --------------------------------------------------------------- model
class TorchDASExact(nn.Module):
    def __init__(self, J=15, stages=2):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1))
        self.stages = nn.ModuleList([
            Stage(has_skip=i != 0, gen_skip=i != stages - 1)
            for i in range(stages)])
        self.lateral = nn.ModuleList([conv_module(256, 256, 1, act=False,
                                                  bias=True, norm='bn')
                                      for _ in range(4)])
        self.fpn = nn.ModuleList([conv_module(256, 256, 3, 1, act=False,
                                              bias=True, norm='bn')
                                  for _ in range(4)])
        self.J = J

        def tower():
            return nn.Sequential(
                conv_module(256, 256, 3, 1, norm='gn', bias=True),
                nn.Sequential(DCNv2(256, 256, bias=True),
                              nn.GroupNorm(32, 256), nn.ReLU(inplace=True)))
        self.cls_tower = tower()
        self.reg_tower = tower()
        self.pose_tower = tower()
        self.cls_prev = conv_module(256, 256, 3, 1, norm='gn', bias=True)
        self.conv_cls = nn.Conv2d(256, 1, 1)
        self.reg_prevs = nn.ModuleList(
            [conv_module(256, 256, 3, 1, norm='gn', bias=True)
             for _ in range(4)])
        self.reg_heads = nn.ModuleList(
            [nn.Conv2d(256, d, 1) for d in (2, 1, 3 * J, 3 * J)])
        self.ctr_prev = conv_module(256, 64, 3, 1, norm='gn', bias=True)
        self.conv_ctr = nn.Conv2d(64, 1, 1)
        self.ru = RecursiveUpdate(J)

    def forward(self, x):
        x = self.stem(x)
        skip1 = skip2 = None
        feats = None
        for i, stage in enumerate(self.stages):
            feats, skip1, skip2, cross = stage(x, skip1, skip2)
            if cross is not None:
                x = cross
        lats = [l(f) for l, f in zip(self.lateral, feats)]
        for i in range(2, -1, -1):
            lats[i] = lats[i] + F.interpolate(lats[i + 1],
                                              size=lats[i].shape[-2:])
        feats = [f(l) for f, l in zip(self.fpn, lats)]
        outs = []
        for f in feats:
            cls_feat = self.cls_tower(f)
            reg_feat = self.reg_tower(f)
            pose_feat = self.pose_tower(f)
            cls = self.conv_cls(self.cls_prev(cls_feat))
            ctr = self.conv_ctr(self.ctr_prev(reg_feat))
            preds = [h(p(reg_feat if i < 2 else pose_feat))
                     for i, (p, h) in enumerate(zip(self.reg_prevs,
                                                    self.reg_heads))]
            ref = self.ru(pose_feat, preds[2])
            outs.append((cls, ctr, preds, ref))
        return outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--size', type=int, nargs=2, default=(640, 1152))
    p.add_argument('--iters', type=int, default=3)
    args = p.parse_args()
    torch.set_num_threads(torch.get_num_threads())
    model = TorchDASExact().eval()
    n_params = sum(p.numel() for p in model.parameters())
    H, W = args.size
    x = torch.randn(1, 3, H, W)
    with torch.no_grad():
        model(x)  # warmup
        n = args.iters
        t0 = time.perf_counter()
        for _ in range(n):
            model(x)
        dt = time.perf_counter() - t0
    print(f'torch-cpu img/s: {n / dt:.4f}  ({dt / n:.2f}s per image, '
          f'{torch.get_num_threads()} threads, {n_params / 1e6:.1f}M '
          f'params, exact DCNv2 + RU sampling)')


if __name__ == '__main__':
    main()
