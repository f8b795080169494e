"""MSPN multi-stage pose backbone (TPU/flax rebuild).

Capability-parity rebuild of the reference ``MSPN2``
(ref: mmdet3d/models/backbones/mspn_mmpose.py:560-722): a ResNet top
(stride 4) feeding N hourglass stages; each stage is a ResNet-50-style
downsample tower plus a top-down upsample module with cross-stage skip
connections. The final stage emits 4 feature maps (256 ch) at strides
4/8/16/32, lowest stride first.

Differences from the reference are layout only (NHWC, functional flax);
module names are chosen so the torch checkpoint bridge
(das_tpu/checkpoint/torch_bridge.py) can map keys mechanically.

Stage freezing (``frozen_stages``) is realised functionally: the frozen
stem/units run with norm-eval semantics here (running stats in forward, no
stat updates) while the optimizer masks their parameter updates
(das_tpu/parallel/train_step.py:mspn_frozen_prefixes) — together equivalent
to the reference's ``_frozen_stage`` eval()+requires_grad_(False).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config.registry import BACKBONES
from ..ops.interp import interpolate_bilinear_ac
from .layers import ConvModule, max_pool_3x3_s2

Dtype = Any


class Bottleneck(nn.Module):
    """ResNet bottleneck, expansion 4 (ref: mspn_mmpose.py:17-157,196)."""
    mid_channels: int            # out_channels == mid_channels * 4
    stride: int = 1
    has_downsample: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_channels = self.mid_channels * 4
        identity = x
        kw = dict(norm_cfg=self.norm_cfg, dtype=self.dtype,
                  axis_name=self.axis_name, bias=False)
        # mmcv builds the three convs with bias=False + separate norms
        out = ConvModule(self.mid_channels, 1, 1, 0, act='relu',
                         name='conv1', **kw)(x, train)
        out = ConvModule(self.mid_channels, 3, self.stride, 1, act='relu',
                         name='conv2', **kw)(out, train)
        out = ConvModule(out_channels, 1, 1, 0, act=None,
                         name='conv3', **kw)(out, train)
        if self.has_downsample:
            identity = ConvModule(out_channels, 1, self.stride, 0, act=None,
                                  name='downsample', **kw)(x, train)
        return nn.relu(out + identity)


class DownsampleModule(nn.Module):
    """ResNet-style downsample tower (ref: mspn_mmpose.py:213-289)."""
    num_blocks: Sequence[int]
    num_units: int = 4
    has_skip: bool = False
    norm_cfg: Optional[dict] = None
    in_channels: int = 64
    frozen_units: int = 0    # first K units run norm-eval (frozen_stages)
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 skip1: Optional[List[jnp.ndarray]],
                 skip2: Optional[List[jnp.ndarray]],
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        out = []
        in_ch = self.in_channels
        for u in range(self.num_units):
            mid = self.in_channels * (2 ** u)            # 64,128,256,512
            stride = 1 if u == 0 else 2
            u_train = train and u >= self.frozen_units
            for b in range(self.num_blocks[u]):
                b_stride = stride if b == 0 else 1
                has_ds = b == 0 and (b_stride != 1 or in_ch != mid * 4)
                x = Bottleneck(mid_channels=mid, stride=b_stride,
                               has_downsample=has_ds,
                               norm_cfg=self.norm_cfg, dtype=self.dtype,
                               axis_name=self.axis_name,
                               name=f'layer{u + 1}_{b}')(x, u_train)
                in_ch = mid * 4
            if self.has_skip:
                x = x + skip1[u] + skip2[u]
            out.append(x)
        return tuple(out[::-1])                          # lowest res first


class UpsampleUnit(nn.Module):
    """One top-down unit (ref: mspn_mmpose.py:292-404)."""
    ind: int
    num_units: int
    unit_channels: int = 256
    gen_skip: bool = False
    gen_cross_conv: bool = False
    norm_cfg: Optional[dict] = None
    out_channels: int = 64
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, up_x: Optional[jnp.ndarray],
                 train: bool = False):
        kw = dict(norm_cfg=self.norm_cfg, dtype=self.dtype,
                  axis_name=self.axis_name, bias='auto')
        out = ConvModule(self.unit_channels, 1, 1, 0, act=None,
                         name='in_skip', **kw)(x, train)
        if self.ind > 0:
            up_x = interpolate_bilinear_ac(up_x, x.shape[1], x.shape[2])
            up_x = ConvModule(self.unit_channels, 1, 1, 0, act=None,
                              name='up_conv', **kw)(up_x, train)
            out = out + up_x
        out = nn.relu(out)

        skip1 = skip2 = None
        if self.gen_skip:
            skip1 = ConvModule(x.shape[-1], 1, 1, 0, act='relu',
                               name='out_skip1', **kw)(x, train)
            skip2 = ConvModule(x.shape[-1], 1, 1, 0, act='relu',
                               name='out_skip2', **kw)(out, train)
        cross_conv = None
        if self.ind == self.num_units - 1 and self.gen_cross_conv:
            cross_conv = ConvModule(self.out_channels, 1, 1, 0, act='relu',
                                    name='cross_conv', **kw)(out, train)
        return out, skip1, skip2, cross_conv


class UpsampleModule(nn.Module):
    """Top-down pathway over the reversed downsample outputs
    (ref: mspn_mmpose.py:407-477)."""
    unit_channels: int = 256
    num_units: int = 4
    gen_skip: bool = False
    gen_cross_conv: bool = False
    norm_cfg: Optional[dict] = None
    out_channels: int = 64
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Sequence[jnp.ndarray], train: bool = False):
        out, skip1, skip2 = [], [], []
        cross_conv = None
        for i in range(self.num_units):
            unit = UpsampleUnit(
                ind=i, num_units=self.num_units,
                unit_channels=self.unit_channels,
                gen_skip=self.gen_skip, gen_cross_conv=self.gen_cross_conv,
                norm_cfg=self.norm_cfg, out_channels=self.out_channels,
                dtype=self.dtype, axis_name=self.axis_name,
                name=f'up{i + 1}')
            up_prev = out[i - 1] if i > 0 else None
            o, s1, s2, cc = unit(x[i], up_prev, train)
            out.append(o)
            skip1.append(s1)
            skip2.append(s2)
            if cc is not None:
                cross_conv = cc
        return out, skip1[::-1], skip2[::-1], cross_conv


class SingleStageNetwork(nn.Module):
    """One hourglass stage (ref: mspn_mmpose.py:480-530)."""
    has_skip: bool = False
    gen_skip: bool = False
    gen_cross_conv: bool = False
    unit_channels: int = 256
    num_units: int = 4
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    norm_cfg: Optional[dict] = None
    in_channels: int = 64
    frozen_units: int = 0
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip1, skip2, train: bool = False):
        mid = DownsampleModule(
            num_blocks=self.num_blocks, num_units=self.num_units,
            has_skip=self.has_skip, norm_cfg=self.norm_cfg,
            in_channels=self.in_channels, frozen_units=self.frozen_units,
            dtype=self.dtype,
            axis_name=self.axis_name, name='downsample')(
                x, skip1, skip2, train)
        return UpsampleModule(
            unit_channels=self.unit_channels, num_units=self.num_units,
            gen_skip=self.gen_skip, gen_cross_conv=self.gen_cross_conv,
            norm_cfg=self.norm_cfg, out_channels=self.in_channels,
            dtype=self.dtype, axis_name=self.axis_name, name='upsample')(
                mid, train)


class ResNetTop(nn.Module):
    """Stem: 7x7/2 conv + BN + ReLU + maxpool (ref: mspn_mmpose.py:533-556)."""
    norm_cfg: Optional[dict] = None
    channels: int = 64
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvModule(self.channels, 7, 2, 3, act='relu',
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       axis_name=self.axis_name, bias='auto',
                       name='top_conv')(img, train)
        return max_pool_3x3_s2(x)


@BACKBONES.register_module()
class MSPN2(nn.Module):
    """Multi-stage MSPN backbone (ref: mspn_mmpose.py:560-667).

    Input NHWC image; output 4 maps (256 ch) at strides 4/8/16/32.
    ``frozen_stages`` / ``norm_eval`` are recorded as attributes and applied
    by the optimizer masking + train-step norm handling, not here.
    """
    unit_channels: int = 256
    num_stages: int = 4
    num_units: int = 4
    num_blocks: Sequence[int] = (2, 2, 2, 2)
    norm_cfg: Optional[dict] = None
    res_top_channels: int = 64
    frozen_stages: int = -1
    norm_eval: bool = False
    remat: bool = False    # rematerialise stages under grad (mem <- FLOPs)
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> List[jnp.ndarray]:
        norm_cfg = self.norm_cfg or dict(type='BN')
        top_train = train and self.frozen_stages < 0
        x = ResNetTop(norm_cfg=norm_cfg, channels=self.res_top_channels,
                      dtype=self.dtype, axis_name=self.axis_name,
                      name='top')(x, top_train)
        skip1 = skip2 = None
        out_feats = []
        stage_cls = SingleStageNetwork
        if self.remat and train:
            # static_argnums counts the module itself: (self, x, skip1, skip2, train)
            stage_cls = nn.remat(SingleStageNetwork, static_argnums=(4,))
        for i in range(self.num_stages):
            stage = stage_cls(
                has_skip=i != 0,
                gen_skip=i != self.num_stages - 1,
                gen_cross_conv=i != self.num_stages - 1,
                unit_channels=self.unit_channels,
                num_units=self.num_units,
                num_blocks=list(self.num_blocks),
                norm_cfg=norm_cfg,
                in_channels=self.res_top_channels,
                frozen_units=max(self.frozen_stages, 0) if i == 0 else 0,
                dtype=self.dtype, axis_name=self.axis_name,
                name=f'stage{i}')
            out, skip1, skip2, x = stage(x, skip1, skip2, train)
            out_feats.append(out)
        # last stage, reversed: strides [4, 8, 16, 32]
        return list(out_feats[-1][::-1])
