"""Fused 3x3 conv + GroupNorm + ReLU Pallas TPU kernel (head towers).

The DASHead towers are stacks of ``ConvModule(3x3, GN(32), relu)``
(ref das_head.py:120-127 / mmcv ConvModule). XLA lowers each module to
a conv fusion, a GroupNorm stat-reduce, and a normalize+relu fusion —
the device trace attributes 37 ms/step of the 640x1152 inference step
to these chains (das_head.py:180, ~22%), ~4x the ~9 ms MXU bound of
their 1.7 TFLOP, because every GN splits the chain into many small
bandwidth/relayout-bound fusions.

At the tower shapes (strides 8..64 of a 640x1152 input, <=80x144x256
per image) a WHOLE image fits in VMEM, so this kernel runs the entire
ConvModule in one pass per image, on a row-flattened layout chosen so
no in-kernel reshape or shifted-copy is ever needed:

* XLA pads the image to (H+2, W8) with zeros (conv halo + >=1 zero
  column so a flat +-1 shift never wraps real pixels) and flattens to
  ``((H+2)*W8 + 8, Cin)``.
* Each of the 9 taps is then ONE contiguous 2-D sublane slice
  ``xb[kh*W8 + kw - 1 :][:H*W8]`` feeding the MXU contraction against
  its (Cin, Cout) kernel slice — f32 accumulation in VMEM.
* GN statistics are reduced in-register from the f32 accumulator
  (sublane sum -> per-group via an indicator-matrix dot), and the
  normalize+relu epilogue writes the only HBM output.

HBM traffic is ``read(x) + write(out)`` — the speed-of-light minimum
for the module.

Semantics: ``relu(GN(conv3x3_same(x)))``, GN over ``num_groups``
contiguous channel groups, eps=1e-5, fast-variance stats and
normalization in f32 (flax GroupNorm defaults). One recorded deviation:
the statistics are computed from the f32 conv accumulator, where the
XLA path first rounds the conv output to bf16 — strictly more precise,
pinned at fp tolerance by
``tests/test_ops.py::test_conv_gn_relu_matches_xla``.

ref: /root/reference/mmdet3d/models/dense_heads/das_head.py:120-127
(tower construction; mmcv ConvModule conv->GN->relu order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_ref, gamma_ref, beta_ref, gmat_ref, x_hbm, out_ref, xb,
            acc, sem, *, H: int, W: int, W8: int, cin: int, cout: int,
            groups: int, eps: float):
    n = pl.program_id(0)
    HW = H * W8

    dma = pltpu.make_async_copy(x_hbm.at[n], xb, sem)
    dma.start()
    dma.wait()

    acc[...] = jnp.zeros((HW, cout), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            # tap (kh, kw): one contiguous flat slice — the zero pad
            # column(s) W..W8 make the +-1 sublane shift read zeros at
            # the real row edges instead of wrapping real pixels
            rows = xb[pl.ds(W8 + kh * W8 + kw - 1, HW)]
            acc[...] = acc[...] + jnp.dot(
                rows, w_ref[kh * 3 + kw],
                preferred_element_type=jnp.float32)

    y2 = acc[...]                                     # (H*W8, Cout) f32
    # pad-column outputs are nonzero (col W's tap reads real col W-1);
    # zero them so the group sums need only the true divisor and the
    # cropped columns can't pollute the statistics
    col = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % W8
    y2 = y2 * (col < W).astype(jnp.float32)

    cnt = float(H * W * (cout // groups))
    ch_s1 = jnp.sum(y2, axis=0, keepdims=True)        # (1, Cout)
    ch_s2 = jnp.sum(y2 * y2, axis=0, keepdims=True)
    gmat = gmat_ref[...]                              # (Cout, G) 0/1
    mean_g = jnp.dot(ch_s1, gmat) * (1.0 / cnt)       # (1, G)
    var_g = jnp.dot(ch_s2, gmat) * (1.0 / cnt) - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_ch = jnp.dot(mean_g, gmat.T)                 # (1, Cout)
    rstd_ch = jnp.dot(rstd_g, gmat.T)
    a = gamma_ref[...] * rstd_ch
    b = beta_ref[...] - mean_ch * a
    out_ref[0] = jnp.maximum(y2 * a + b, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('groups', 'eps',
                                             'interpret'))
def conv_gn_relu(x: jnp.ndarray,
                 weight: jnp.ndarray,
                 gamma: jnp.ndarray,
                 beta: jnp.ndarray,
                 groups: int = 32,
                 eps: float = 1e-5,
                 interpret: bool = False) -> jnp.ndarray:
    """relu(GroupNorm(conv3x3_same(x))) in one fused VMEM pass per image.

    Args: x (N,H,W,Cin) NHWC; weight (3,3,Cin,Cout) HWIO (no bias — GN
    absorbs it, matching ConvModule bias='auto'); gamma/beta (Cout,).
    """
    N, H, W, Cin = x.shape
    Cout = weight.shape[-1]
    assert weight.shape[:2] == (3, 3) and Cout % groups == 0
    # >= 1 zero column is load-bearing (flat-shift wrap), so round W+1
    # up to the sublane multiple
    W8 = -(-(W + 1) // 8) * 8
    flat = (H + 2) * W8
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, W8 - W), (0, 0)))
    # flat-space guard rows: W8 zeros in front (the kh=0,kw=0 tap slice
    # starts one element before the padded image) and W8 after (the
    # kh=2,kw=2 slice ends one element past it)
    xp = xp.reshape(N, flat, Cin)
    xp = jnp.pad(xp, ((0, 0), (W8, W8), (0, 0)))

    w_r = weight.reshape(9, Cin, Cout).astype(x.dtype)
    gamma_f = gamma.astype(jnp.float32).reshape(1, Cout)
    beta_f = beta.astype(jnp.float32).reshape(1, Cout)
    cg = Cout // groups
    gmat = (jnp.arange(Cout)[:, None] // cg ==
            jnp.arange(groups)[None, :]).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, H=H, W=W, W8=W8, cin=Cin, cout=Cout, groups=groups,
        eps=float(eps))

    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((9, Cin, Cout), lambda n: (0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda n: (0, 0)),
            pl.BlockSpec((1, Cout), lambda n: (0, 0)),
            pl.BlockSpec((Cout, groups), lambda n: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H * W8, Cout), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H * W8, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((flat + 2 * W8, Cin), x.dtype),
            pltpu.VMEM((H * W8, Cout), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w_r, gamma_f, beta_f, gmat, xp)
    return out.reshape(N, H, W8, Cout)[:, :, :W]
