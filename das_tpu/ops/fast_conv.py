"""Conv2D with a selectable lowering (XLA conv op vs im2col matmul).

On the axon TPU terminal, ``lax.conv_general_dilated`` compiles to
drastically different code quality across shapes, while the same math as
shifted-slice im2col patches + ONE einsum rides the MXU consistently
(see tools/analysis_tools/conv_bench.py for per-shape measurements).
``conv2d`` exposes both lowerings behind one call; ``impl='auto'``
resolves per-platform at trace time:

* ``cpu``  -> the XLA conv op (oneDNN path; im2col is 9x the memory);
* TPU/axon -> im2col for spatial (K>1) kernels, XLA conv for 1x1 (a 1x1
  conv IS a matmul already — both lowerings are identical there).

The module-level default can be overridden with env ``DAS_TPU_CONV_IMPL``
(``xla`` | ``im2col`` | ``auto``) without touching configs.

``FastConv`` is a drop-in for ``flax.linen.Conv`` restricted to the
square-kernel NHWC case this model uses, with an IDENTICAL parameter
structure ('kernel' (K,K,Cin,Cout), 'bias' (Cout,)) so checkpoints and
the torch bridge are unaffected.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.lax as lax
import jax.numpy as jnp

Dtype = Any


def _default_impl() -> str:
    return os.environ.get('DAS_TPU_CONV_IMPL', 'auto')


def _resolve_impl(impl: str, kernel_size: int) -> str:
    if impl == 'auto':
        impl = _default_impl()
    if impl == 'auto':
        if jax.default_backend() == 'cpu' or kernel_size == 1:
            return 'xla'
        return 'im2col'
    return impl


def conv2d(x: jnp.ndarray, w: jnp.ndarray,
           stride: int = 1, padding: int = 0,
           impl: str = 'auto') -> jnp.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC.

    Args:
        x: (N, H, W, Cin); w: (K, K, Cin, Cout); square kernel/stride.
    """
    K = w.shape[0]
    impl = _resolve_impl(impl, K)
    if impl == 'xla':
        return lax.conv_general_dilated(
            x, w, (stride, stride), ((padding, padding),) * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=x.dtype)
    if impl != 'im2col':
        raise ValueError(f'unknown conv impl {impl!r}')

    N, H, W, C = x.shape
    Ho = (H + 2 * padding - K) // stride + 1
    Wo = (W + 2 * padding - K) // stride + 1
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding),
                        (0, 0)))
    if K == 1:
        patches = x[:, ::stride, ::stride]
    else:
        cols = [x[:, kh:kh + (Ho - 1) * stride + 1:stride,
                  kw:kw + (Wo - 1) * stride + 1:stride]
                for kh in range(K) for kw in range(K)]
        patches = jnp.concatenate(cols, axis=-1)        # (N,Ho,Wo,K*K*C)
    return jnp.einsum('nhwk,ko->nhwo', patches,
                      w.reshape(K * K * C, -1),
                      preferred_element_type=x.dtype)


class FastConv(nn.Module):
    """flax.linen.Conv drop-in (square-kernel NHWC) with impl selection.

    Parameter structure matches nn.Conv exactly: 'kernel' (K,K,Cin,Cout)
    stored in f32 (param_dtype), 'bias' (Cout,).
    """
    features: int
    kernel_size: Union[int, Sequence[int]] = 1
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence] = 0
    use_bias: bool = True
    kernel_init: Any = nn.linear.default_kernel_init
    bias_init: Any = nn.initializers.zeros
    impl: str = 'auto'
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        k = k[0] if isinstance(k, (tuple, list)) else k
        s = self.strides
        s = s[0] if isinstance(s, (tuple, list)) else s
        p = self.padding
        if isinstance(p, (tuple, list)):
            p = p[0]
            if isinstance(p, (tuple, list)):
                p = p[0]
        dtype = self.dtype or x.dtype
        kernel = self.param('kernel', self.kernel_init,
                            (k, k, x.shape[-1], self.features), jnp.float32)
        x = conv2d(x.astype(dtype), kernel.astype(dtype),
                   stride=s, padding=int(p), impl=self.impl)
        if self.use_bias:
            bias = self.param('bias', self.bias_init,
                              (self.features,), jnp.float32)
            x = x + bias.astype(dtype)
        return x
