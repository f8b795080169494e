"""Probe Mosaic's in-kernel dynamic gather on the axon backend.

Mosaic lowers lax.gather ONLY as a same-shape 2D take_along_axis
(tpu.dynamic_gather) — exactly the shape of the recursive-update
offset sampling, where the output grid IS the table grid (P == S).
Round 2 recorded an HTTP 500 from the remote Mosaic compiler for this
pattern; this probe re-tests compile + correctness + speed.

Run on the real chip:  python tools/analysis_tools/pallas_gather_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    M, C = 11520, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, C), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, M, (M,)), jnp.int32)

    def kernel(x_ref, idx_ref, o_ref):
        ind = jnp.broadcast_to(idx_ref[:, :], x_ref.shape)
        o_ref[:, :] = jnp.take_along_axis(
            x_ref[:, :], ind, axis=0, mode='promise_in_bounds')

    @jax.jit
    def gather_pl(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        )(x, idx[:, None])

    try:
        out = gather_pl(x, idx)
        ref = np.asarray(x)[np.asarray(idx)]
        err = float(jnp.abs(out - jnp.asarray(ref)).max())
        print(f'pallas dynamic_gather ({M}x{C}): compiles, max err {err}')
    except Exception as e:
        print(f'pallas dynamic_gather FAILED: {type(e).__name__}: '
              f'{str(e)[:300]}')
        return

    # timing: chain iterations inside one program
    def chained(x, idx):
        def body(_, acc):
            g = gather_pl(acc, idx)
            return acc + g * jnp.bfloat16(1e-20)
        return jax.lax.fori_loop(0, 16, body, x)

    cfn = jax.jit(chained)
    np.asarray(cfn(x, idx).ravel()[:1])
    t0 = time.perf_counter()
    np.asarray(cfn(x + jnp.bfloat16(1e-3), idx).ravel()[:1])
    dt = (time.perf_counter() - t0) / 16
    rows_ns = dt / M * 1e9
    print(f'pallas gather: {dt * 1e3:.3f} ms per ({M}x{C}) gather '
          f'= {rows_ns:.2f} ns/row')


if __name__ == '__main__':
    main()
