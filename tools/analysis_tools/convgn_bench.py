"""Fused conv+GN+relu kernel shootout at the head-tower shapes.

Compares, at each tower level shape of the 640x1152 eval input
(strides 8/16/32/64, 256ch, GN(32)):

* ``xla``    — lax.conv + flax-style GroupNorm + relu (what ConvModule
               runs today; the device trace prices the towers at
               37 ms/step, ~4x their MXU bound);
* ``pallas`` — ops/pallas_convgn.conv_gn_relu (whole image VMEM-
               resident, stats in-register, read+write HBM traffic).

Uses the chained-window harness (see conv_bench.timed): ``iters``
dependent evaluations inside one jit program, best of several spread
windows — the chip is time-shared and a contended window reads 10-20x
slow.

Run on the real chip:  python tools/analysis_tools/convgn_bench.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def timed(fn, args, iters=8, windows=5):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    args = list(args)

    def chained(*a):
        a = list(a)

        def body(_, x):
            out = fn(x, *a[1:])
            eps = out.astype(jnp.float32).ravel()[0]
            return x + (eps * 1e-20).astype(x.dtype)
        return lax.fori_loop(0, iters, body, a[0])

    cfn = jax.jit(chained)
    out = cfn(*args)
    np.asarray(out.ravel()[:1])
    best = float('inf')
    for w in range(windows):
        a0 = args[0] + 1e-6 * (w + 1)
        t0 = time.perf_counter()
        out = cfn(a0, *args[1:])
        np.asarray(out.ravel()[:1])
        best = min(best, time.perf_counter() - t0)
        time.sleep(2.0)
    return best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--iters', type=int, default=8)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import jax.lax as lax
    from das_tpu.utils.cache import jax_cache_dir
    from das_tpu.ops.pallas_convgn import conv_gn_relu
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    dt = getattr(jnp, args.dtype)
    N = args.batch
    G = 32
    rng = np.random.RandomState(0)

    shapes = [('s8', 80, 144, 256, 256), ('s16', 40, 72, 256, 256),
              ('s32', 20, 36, 256, 256), ('s64', 10, 18, 256, 256),
              ('s8-cness', 80, 144, 256, 64)]

    for tag, H, W, Cin, Cout in shapes:
        x = jnp.asarray(rng.randn(N, H, W, Cin), dt)
        w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.05, dt)
        gamma = jnp.asarray(rng.rand(Cout) + 0.5, jnp.float32)
        beta = jnp.asarray(rng.randn(Cout) * 0.1, jnp.float32)
        flops = 2 * N * H * W * 9 * Cin * Cout

        def xla_mod(x, w, gamma, beta):
            y = lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            yf = y.astype(jnp.float32)
            yg = yf.reshape(*yf.shape[:3], G, Cout // G)
            mean = yg.mean(axis=(1, 2, 4), keepdims=True)
            var = (yg * yg).mean(axis=(1, 2, 4), keepdims=True) \
                - mean * mean
            yn = (yg - mean) * lax.rsqrt(var + 1e-5)
            yn = yn.reshape(yf.shape) * gamma + beta
            return jnp.maximum(yn, 0.0).astype(x.dtype)

        def pallas_mod(x, w, gamma, beta):
            return conv_gn_relu(x, w, gamma, beta, groups=G)

        for name, fn in (('xla', xla_mod), ('pallas', pallas_mod)):
            t = timed(fn, (x, w, gamma, beta), iters=args.iters)
            print(f'{tag:10s} {name:7s} {t * 1e3:8.3f} ms '
                  f'{flops / t / 1e12:6.2f} TFLOP/s', flush=True)


if __name__ == '__main__':
    main()
