"""FPN neck (TPU/flax rebuild of mmdet FPN as configured by DAS).

The DAS configs use a plain 4-in/4-out FPN with norm
(ref: configs/das/exp_panoptic.py:24-30 — in_channels [256]*4, out 256,
norm SyncBN/BN, num_outs=4, start_level 0, no extra convs). Only that
configuration surface is rebuilt; lateral 1x1 convs, nearest top-down
summation, and 3x3 output convs, all without activation.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..config.registry import NECKS
from ..ops.interp import upsample_nearest
from .layers import ConvModule

Dtype = Any


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 256, 256, 256)
    out_channels: int = 256
    num_outs: int = 4
    start_level: int = 0
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray],
                 train: bool = False) -> List[jnp.ndarray]:
        assert len(inputs) == len(self.in_channels)
        used = len(self.in_channels) - self.start_level
        assert self.num_outs == used, \
            'extra FPN levels are outside the DAS config surface'
        kw = dict(norm_cfg=self.norm_cfg, dtype=self.dtype,
                  axis_name=self.axis_name, bias='auto', act=None)

        laterals = [
            ConvModule(self.out_channels, 1, 1, 0,
                       name=f'lateral_convs_{i}', **kw)(
                           inputs[i + self.start_level], train)
            for i in range(used)
        ]
        # top-down pathway, nearest upsample (mmdet FPN semantics)
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest(
                laterals[i], laterals[i - 1].shape[1],
                laterals[i - 1].shape[2])
        outs = [
            ConvModule(self.out_channels, 3, 1, 1,
                       name=f'fpn_convs_{i}', **kw)(laterals[i], train)
            for i in range(used)
        ]
        return outs
