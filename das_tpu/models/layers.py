"""Flax building blocks shared by the DAS model family.

``ConvModule`` mirrors the conv->norm->act unit the reference composes
everywhere (mmcv ConvModule used in mspn_mmpose.py / das_head.py /
recursive_update.py), including the DCNv2 variant
(``conv_cfg=dict(type='DCNv2')``). Everything is NHWC and jit-friendly.

Norm semantics:
* ``BN`` / ``SyncBN`` -> flax BatchNorm (torch eps 1e-5, momentum 0.1).
  ``SyncBN`` becomes a cross-replica BatchNorm by giving it the mesh axis
  name — moments are averaged with a ``pmean`` over the data axis, the
  TPU-native equivalent of the reference's mmcv SyncBN CUDA op
  (SURVEY.md §2.2).
* ``GN``  -> GroupNorm(32) (torch eps 1e-5).
"""

from __future__ import annotations

from typing import Any, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_conv import modulated_deform_conv

Dtype = Any


def make_norm(norm_cfg: Optional[dict], name: str, dtype: Dtype,
              axis_name: Optional[str]) -> Optional[nn.Module]:
    """Build a norm layer from an mmcv-style norm_cfg dict."""
    if norm_cfg is None:
        return None
    # norm_cfg may be a dict, ConfigDict or flax FrozenDict — duck-type
    kind = norm_cfg if isinstance(norm_cfg, str) else norm_cfg['type']
    if kind in ('BN', 'SyncBN'):
        return nn.BatchNorm(
            use_running_average=None,  # passed at call time
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            axis_name=axis_name if kind == 'SyncBN' else None,
            name=name)
    if kind == 'GN':
        num_groups = 32 if isinstance(norm_cfg, str) \
            else norm_cfg.get('num_groups', 32)
        return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5,
                            dtype=dtype, name=name)
    raise ValueError(f'unsupported norm type {kind}')


class DeformConv2d(nn.Module):
    """DCNv2 pack layer: zero-init offset conv + modulated deform conv."""
    features: int
    kernel_size: int = 3
    padding: int = 1
    use_bias: bool = True
    kernel_init: Any = None
    # 'patch' fetches each tap's 2x2 corner window as ONE slice-gather:
    # measured ~30% faster than per-corner row gathers, bit-identical.
    # 'shift' trades the gather for dense shifted multiply-adds (streaming
    # HBM reads); exact only while offsets stay within +-shift_radius px.
    # 'hybrid' adds exact sparse corrections for up to shift_budget
    # out-of-radius taps per image on top of the shift base.
    gather_mode: str = 'patch'
    # Training-time lowering override. 'auto' keeps the eval mode's
    # semantics with a train-safe execution strategy (patch -> clip
    # row gathers: the windowed scatter-add adjoint of 'patch' crashed
    # the v5e worker; pallas modes -> their XLA equivalents: the fused
    # kernels have no VJP). Setting it explicitly (e.g. 'hybrid') trades
    # the gather adjoint for the dense shift expansion, whose transpose
    # is itself dense shifts — measured 3.4x faster train step, exact
    # DCNv2 values AND gradients while deform_offset_overflow == 0.
    train_gather_mode: str = 'auto'
    shift_radius: int = 2
    shift_budget: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        kk = k * k
        raw = nn.Conv(features=3 * kk,
                      kernel_size=(k, k),
                      padding=[(self.padding, self.padding)] * 2,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype,
                      name='conv_offset')(x)
        offset = raw[..., :2 * kk]
        mask = nn.sigmoid(raw[..., 2 * kk:])
        # collected only under apply(..., mutable=['intermediates']):
        # lets tools/validate_hybrid.py bound every layer's learned
        # offsets before trusting the 'shift'/'hybrid' lowerings
        self.sow('intermediates', 'dcn_offset', offset)
        cin = x.shape[-1]
        weight = self.param(
            'kernel', self.kernel_init or nn.initializers.he_normal(),
            (k, k, cin, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        # Under training the patch slice-gather is replaced by per-corner
        # row gathers: the windowed scatter-add adjoint of 'patch' crashed
        # the v5e TPU worker or ran 5.5x slower when it survived
        # (train_bench A/B, round 4); the lowerings are bit-equal so this
        # changes execution strategy only, never values or gradients.
        # The fused Pallas modes are eval-only (no custom VJP) — training
        # falls back to their XLA equivalents, same semantics.
        gather_mode = self.gather_mode
        if train:
            if self.train_gather_mode != 'auto':
                gather_mode = self.train_gather_mode
            else:
                gather_mode = {'patch': 'clip',
                               'shift_pallas': 'shift',
                               'hybrid_pallas': 'hybrid'}.get(gather_mode,
                                                              gather_mode)
        return modulated_deform_conv(
            x.astype(self.dtype), offset.astype(self.dtype),
            mask.astype(self.dtype), weight.astype(self.dtype),
            None if bias is None else bias.astype(self.dtype),
            kernel_size=k, padding=self.padding,
            gather_mode=gather_mode,
            shift_radius=self.shift_radius,
            shift_budget=self.shift_budget)


class ConvModule(nn.Module):
    """conv -> norm -> act, matching mmcv ConvModule defaults.

    ``bias='auto'`` means bias iff there is no norm (mmcv behaviour).
    ``kernel_init`` overrides the conv weight initializer (the reference
    head initializes every Conv2d with Normal(std=0.01),
    ref anchor_free_mono3d_pose_head.py:92-98).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    bias: Union[str, bool] = 'auto'
    norm_cfg: Optional[dict] = None
    act: Optional[str] = 'relu'
    dcn: bool = False
    dcn_gather_mode: str = 'patch'
    dcn_train_gather_mode: str = 'auto'
    dcn_shift_radius: int = 2
    dcn_shift_budget: int = 2048
    kernel_init: Any = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    fused_gn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        use_bias = (self.norm_cfg is None) if self.bias == 'auto' \
            else bool(self.bias)
        if self._use_fused_gn(train, use_bias):
            return self._fused_gn_call(x)
        kinit = self.kernel_init
        if self.dcn:
            assert self.stride == 1
            x = DeformConv2d(features=self.features,
                             kernel_size=self.kernel_size,
                             padding=self.padding,
                             use_bias=use_bias,
                             kernel_init=kinit,
                             gather_mode=self.dcn_gather_mode,
                             train_gather_mode=self.dcn_train_gather_mode,
                             shift_radius=self.dcn_shift_radius,
                             shift_budget=self.dcn_shift_budget,
                             dtype=self.dtype,
                             name='conv')(x, train)
        else:
            x = nn.Conv(features=self.features,
                        kernel_size=(self.kernel_size, self.kernel_size),
                        strides=(self.stride, self.stride),
                        padding=[(self.padding, self.padding)] * 2,
                        use_bias=use_bias,
                        kernel_init=kinit or
                        nn.linear.default_kernel_init,
                        dtype=self.dtype,
                        name='conv')(x)
        norm = make_norm(self.norm_cfg, 'bn' if (self.norm_cfg or {}).get(
            'type', 'BN') != 'GN' else 'gn', self.dtype, self.axis_name)
        if norm is not None:
            if isinstance(norm, nn.BatchNorm):
                x = norm(x, use_running_average=not train)
            else:
                x = norm(x)
        if self.act == 'relu':
            x = nn.relu(x)
        elif self.act is not None:
            raise ValueError(f'unsupported act {self.act}')
        return x

    def _use_fused_gn(self, train: bool, use_bias: bool) -> bool:
        return (self.fused_gn and not train and not self.dcn
                and not use_bias and self.kernel_size == 3
                and self.stride == 1 and self.padding == 1
                and self.act == 'relu'
                and (self.norm_cfg or {}).get('type') == 'GN')

    def _fused_gn_call(self, x: jnp.ndarray) -> jnp.ndarray:
        """Eval-only fused conv+GN+relu (ops/pallas_convgn): one VMEM
        pass per image instead of conv fusion -> GN stat-reduce ->
        normalize+relu HBM round-trips. Params are created through the
        ordinary ``nn.Conv``/``nn.GroupNorm`` children (tiny probe
        calls, dead-code-eliminated by XLA) so the parameter tree — and
        with it checkpoints and the torch bridge — is identical to the
        unfused module."""
        from ..ops.pallas_convgn import conv_gn_relu
        conv = nn.Conv(features=self.features,
                       kernel_size=(self.kernel_size, self.kernel_size),
                       strides=(1, 1), padding=[(1, 1)] * 2,
                       use_bias=False,
                       kernel_init=self.kernel_init or
                       nn.linear.default_kernel_init,
                       dtype=self.dtype, name='conv')
        _ = conv(x[:, :1, :1, :])
        norm = make_norm(self.norm_cfg, 'gn', self.dtype, self.axis_name)
        _ = norm(x[:, :1, :1, :self.features]
                 if x.shape[-1] >= self.features
                 else jnp.zeros(x.shape[:1] + (1, 1, self.features),
                                x.dtype))
        kernel = conv.variables['params']['kernel']
        gamma = norm.variables['params']['scale']
        beta = norm.variables['params']['bias']
        dd = jax.config.jax_default_device
        platform = dd.platform if dd is not None \
            else jax.devices()[0].platform
        groups = 32 if not isinstance(self.norm_cfg, dict) \
            else self.norm_cfg.get('num_groups', 32)
        return conv_gn_relu(x.astype(self.dtype),
                            kernel.astype(self.dtype), gamma, beta,
                            groups=groups,
                            interpret=platform != 'tpu')


class Scale(nn.Module):
    """Learnable scalar multiplier (ref: mmcv Scale at das_head.py:171)."""
    init: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.param('scale',
                       lambda key: jnp.asarray(self.init, jnp.float32))
        return x * s


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1) in NHWC."""
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))
