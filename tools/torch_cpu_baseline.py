"""Measure the PyTorch-CPU throughput baseline for BASELINE.json.

The reference stack itself (mmcv/mmdet/mmdet3d) is not installed in this
image, so this script builds a *structurally equivalent* pure-torch model —
MSPN 2-stage [3,4,6,3] backbone, 4-level FPN, DAS head towers with the
recursive-update grid-sample branch — and measures forward img/s on CPU at
the Panoptic test bucket (640x1152). Deformable convs are approximated with
plain 3x3 convs plus their offset convs, which only makes the torch
baseline FASTER (i.e. our reported speedup conservative).

Run:  python tools/torch_cpu_baseline.py
"""

import time

import torch
import torch.nn as nn
import torch.nn.functional as F


def bottleneck(cin, mid, stride=1):
    layers = nn.Sequential(
        nn.Conv2d(cin, mid, 1, bias=False), nn.BatchNorm2d(mid),
        nn.ReLU(inplace=True),
        nn.Conv2d(mid, mid, 3, stride, 1, bias=False), nn.BatchNorm2d(mid),
        nn.ReLU(inplace=True),
        nn.Conv2d(mid, mid * 4, 1, bias=False), nn.BatchNorm2d(mid * 4))
    down = None
    if stride != 1 or cin != mid * 4:
        down = nn.Sequential(nn.Conv2d(cin, mid * 4, 1, stride, bias=False),
                             nn.BatchNorm2d(mid * 4))
    return layers, down


class Block(nn.Module):
    def __init__(self, cin, mid, stride=1):
        super().__init__()
        self.body, self.down = bottleneck(cin, mid, stride)

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        return F.relu(self.body(x) + idt)


class Stage(nn.Module):
    def __init__(self, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.units = nn.ModuleList()
        cin = 64
        for u, n in enumerate(blocks):
            mid = 64 * 2 ** u
            mods = [Block(cin, mid, 1 if u == 0 else 2)]
            cin = mid * 4
            mods += [Block(cin, mid) for _ in range(n - 1)]
            self.units.append(nn.Sequential(*mods))
        self.up = nn.ModuleList([
            nn.Conv2d(c, 256, 1) for c in [2048, 1024, 512, 256]])
        self.up_conv = nn.ModuleList([nn.Conv2d(256, 256, 1)
                                      for _ in range(3)])

    def forward(self, x):
        feats = []
        for unit in self.units:
            x = unit(x)
            feats.append(x)
        feats = feats[::-1]
        outs = [self.up[0](feats[0])]
        for i in range(1, 4):
            up = F.interpolate(outs[-1], size=feats[i].shape[-2:],
                               mode='bilinear', align_corners=True)
            outs.append(self.up[i](feats[i]) + self.up_conv[i - 1](up))
        return outs[::-1], x


class TorchDASEquivalent(nn.Module):
    def __init__(self, J=15, stages=2):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1))
        self.stages = nn.ModuleList([Stage() for _ in range(stages)])
        self.cross = nn.ModuleList([nn.Conv2d(256, 64, 1)
                                    for _ in range(stages - 1)])
        self.lateral = nn.ModuleList([nn.Conv2d(256, 256, 1)
                                      for _ in range(4)])
        self.fpn = nn.ModuleList([nn.Conv2d(256, 256, 3, padding=1)
                                  for _ in range(4)])
        self.J = J

        def tower():
            return nn.Sequential(
                nn.Conv2d(256, 256, 3, padding=1), nn.GroupNorm(32, 256),
                nn.ReLU(inplace=True),
                nn.Conv2d(256, 27, 1),               # offset conv stand-in
                nn.Conv2d(27, 256, 3, padding=1), nn.GroupNorm(32, 256),
                nn.ReLU(inplace=True))
        self.cls_tower = tower()
        self.reg_tower = tower()
        self.pose_tower = tower()
        self.cls_head = nn.Sequential(nn.Conv2d(256, 256, 3, padding=1),
                                      nn.Conv2d(256, 1, 1))
        self.ctr_head = nn.Sequential(nn.Conv2d(256, 64, 3, padding=1),
                                      nn.Conv2d(64, 1, 1))
        self.reg_heads = nn.ModuleList([
            nn.Sequential(nn.Conv2d(256, 256, 3, padding=1),
                          nn.Conv2d(256, d, 1))
            for d in (2, 1, 3 * J, 3 * J)])
        self.ru_reduce = nn.Conv2d(256, 256, 1)
        self.ru_sample = nn.Conv2d(256, J * 8, 1)
        self.ru_conf = nn.Conv2d(256, J * 3, 1)

    def forward(self, x):
        x = self.stem(x)
        feats = None
        for i, stage in enumerate(self.stages):
            feats, cross = stage(x)
            if i < len(self.stages) - 1:
                x = self.cross[i](cross if cross.shape[1] == 256
                                  else feats[0])
        outs = []
        lats = [l(f) for l, f in zip(self.lateral, feats)]
        for i in range(2, -1, -1):
            lats[i] = lats[i] + F.interpolate(lats[i + 1],
                                              size=lats[i].shape[-2:])
        feats = [f(l) for f, l in zip(self.fpn, lats)]
        J = self.J
        for f in feats:
            cls = self.cls_head(self.cls_tower(f))
            reg = self.reg_tower(f)
            pose = self.pose_tower(f)
            ctr = self.ctr_head(reg)
            preds = [h(reg if i < 2 else pose)
                     for i, h in enumerate(self.reg_heads)]
            # recursive-update: grid sample the uvd field at proposals
            feat = self.ru_reduce(pose)
            samp = self.ru_sample(feat)
            b, _, h, w = samp.shape
            grid = samp.view(b * J, 4, 2, h, w)[:, 0].permute(0, 2, 3, 1)
            grid = grid.clamp(-1, 1)
            uvd = preds[2].view(b * J, 3, h, w)
            ref = F.grid_sample(uvd, grid, align_corners=False)
            outs.append((cls, ctr, preds, ref))
        return outs


def main():
    torch.set_num_threads(torch.get_num_threads())
    model = TorchDASEquivalent().eval()
    H, W = 640, 1152
    x = torch.randn(1, 3, H, W)
    with torch.no_grad():
        model(x)  # warmup
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            model(x)
        dt = time.perf_counter() - t0
    print(f'torch-cpu img/s: {n / dt:.4f}  ({dt / n:.2f}s per image, '
          f'{torch.get_num_threads()} threads)')


if __name__ == '__main__':
    main()
