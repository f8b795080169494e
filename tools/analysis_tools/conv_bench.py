"""Conv lowering shootout at the model's real shapes (axon backend).

The chained dcn_bench run showed lax.conv_general_dilated at 0.8 TFLOP/s
while the SAME math as im2col patches + one matmul hit 12.5 TFLOP/s on
this terminal — a 16x conv-lowering gap. This sweeps the model's actual
conv shapes to map where the gap holds before rewriting ConvModule.

Run on the real chip:  python tools/analysis_tools/conv_bench.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def timed(fn, args, iters=8, perturb_idx=0):
    """Chain ``iters`` dependent evaluations inside one jit program (the
    relay costs ~90 ms per dispatch; see dcn_bench.timed)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    args = list(args)

    def chained(*a):
        a = list(a)

        def body(_, x):
            out = fn(*[x if j == perturb_idx else a[j]
                       for j in range(len(a))])
            # one scalar from EVERY leaf: a single-leaf feedback lets XLA
            # dead-code-eliminate the unused outputs
            eps = sum(leaf.astype(jnp.float32).ravel()[0]
                      for leaf in jax.tree.leaves(out))
            return x + (eps * 1e-20).astype(x.dtype)
        return lax.fori_loop(0, iters, body, a[perturb_idx])

    cfn = jax.jit(chained)
    out = cfn(*args)
    np.asarray(out.ravel()[:1])
    # the chip is time-shared: sample several spread windows, report the
    # best (a contended window reads 10-20x slow)
    best = float('inf')
    for w in range(5):
        a0 = args[perturb_idx] + 1e-6 * (w + 1)
        wargs = [a0 if i == perturb_idx else a for i, a in enumerate(args)]
        t0 = time.perf_counter()
        out = cfn(*wargs)
        np.asarray(out.ravel()[:1])
        best = min(best, time.perf_counter() - t0)
        time.sleep(2.0)
    return best / iters


def im2col_conv(x, w, stride=1, padding=None):
    """K*K conv as shifted-slice patches + one matmul (NHWC, HWIO)."""
    import jax.numpy as jnp
    K = w.shape[0]
    if padding is None:
        padding = (K - 1) // 2
    N, H, W, C = x.shape
    Ho = (H + 2 * padding - K) // stride + 1
    Wo = (W + 2 * padding - K) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding),
                     (0, 0)))
    cols = [xp[:, kh:kh + (Ho - 1) * stride + 1:stride,
               kw:kw + (Wo - 1) * stride + 1:stride]
            for kh in range(K) for kw in range(K)]
    patches = jnp.concatenate(cols, axis=-1)            # (N,Ho,Wo,K*K*C)
    return jnp.einsum(
        'nhwk,ko->nhwo', patches,
        w.transpose(0, 1, 2, 3).reshape(K * K * C, -1),
        preferred_element_type=x.dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--dtype', default='bfloat16')
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import jax.lax as lax
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    dt = getattr(jnp, args.dtype)
    N = args.batch
    rng = np.random.RandomState(0)

    # (tag, H, W, Cin, Cout, K, stride) — real shapes @ 640x1152 eval
    shapes = [
        ('stem 7x7/2',      640, 1152,   3,  64, 7, 2),
        ('mspn 3x3 s4',     160,  288,  64,  64, 3, 1),
        ('mspn 1x1 s4',     160,  288, 256,  64, 1, 1),
        ('mspn down 3x3/2', 160,  288, 256, 256, 3, 2),
        ('fpn out 3x3',      80,  144, 256, 256, 3, 1),
        ('tower 3x3 s8',     80,  144, 256, 256, 3, 1),
        ('tower 3x3 s16',    40,   72, 256, 256, 3, 1),
        ('tower 3x3 s32',    20,   36, 256, 256, 3, 1),
        ('head 1x1 s8',      80,  144, 256,  96, 1, 1),
    ]

    for tag, H, W, Cin, Cout, K, s in shapes:
        x = jnp.asarray(rng.randn(N, H, W, Cin), dt)
        w = jnp.asarray(rng.randn(K, K, Cin, Cout) * 0.05, dt)
        pad = (K - 1) // 2
        Ho = (H + 2 * pad - K) // s + 1
        Wo = (W + 2 * pad - K) // s + 1
        flops = 2 * N * Ho * Wo * K * K * Cin * Cout

        conv = lambda x, w: lax.conv_general_dilated(
            x, w, (s, s), ((pad, pad), (pad, pad)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=dt)
        t1 = timed(conv, [x, w])
        t2 = timed(lambda x, w: im2col_conv(x, w, stride=s), [x, w])
        print(f'{tag:18s} conv {t1 * 1e3:8.2f} ms ({flops / t1 / 1e12:6.1f}'
              f' TF/s) | im2col {t2 * 1e3:8.2f} ms '
              f'({flops / t2 / 1e12:6.1f} TF/s)  x{t1 / t2:.1f}',
              flush=True)


if __name__ == '__main__':
    main()
