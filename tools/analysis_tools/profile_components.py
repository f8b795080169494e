"""Component-level timing of the inference path on the current backend.

Times backbone / neck / head / decode separately (each as its own jitted
program) to locate the throughput bottleneck.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def timed(fn, *args, iters=5):
    """Time fn, perturbing the first array arg so the execution relay can't
    memoize identical dispatches.

    block_until_ready is unreliable over the axon relay and large
    device->host transfers are pathologically slow, so completion is
    forced by fetching ONE scalar of the output each iteration (~2 ms
    dispatch+transfer overhead, measured)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    def fetch_scalar(tree):
        leaf = jax.tree.leaves(tree)[0]
        return np.asarray(leaf.ravel()[0])

    out = fn(*args)
    fetch_scalar(out)
    args = list(args)

    def perturb(tree, eps):
        done = [False]

        def fn_(x):
            if not done[0] and hasattr(x, 'dtype') and \
                    jnp.issubdtype(x.dtype, jnp.floating):
                done[0] = True
                return x + eps.astype(x.dtype)
            return x
        out_tree = jax.tree.map(fn_, tree)
        return out_tree, done[0]

    t0 = time.perf_counter()
    for _ in range(iters):
        leaf = jax.tree.leaves(out)[0]
        eps = leaf.astype(jnp.float32).ravel()[0] * 1e-12
        for i in range(len(args)):
            new_arg, ok = perturb(args[i], eps)
            if ok:
                args[i] = new_arg
                break
        out = fn(*args)
        fetch_scalar(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--height', type=int, default=640)
    parser.add_argument('--width', type=int, default=1152)
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--dtype', default='bfloat16')
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.models import build_model
    from das_tpu.core.decode import decode_batch

    dtype = getattr(jnp, args.dtype)
    cfg = Config.fromfile('configs/das/exp_panoptic.py')
    model = build_model(dict(cfg.model), dtype=dtype)
    B, H, W = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3))))
    head = cfg.model.bbox_head
    strides = tuple(head.strides)
    J = int(head.num_joints)

    backbone = jax.jit(lambda v, x: model.apply(
        v, x, False, method=type(model).extract_feat))
    full = jax.jit(lambda v, x: model.apply(v, x, train=False))

    t_bb, feats = timed(backbone, variables, img)
    print(f'backbone+neck: {t_bb * 1e3:.1f} ms '
          f'({B / t_bb:.1f} img/s)')

    t_full, outs = timed(full, variables, img)
    print(f'full forward:  {t_full * 1e3:.1f} ms '
          f'({B / t_full:.1f} img/s) -> head {1e3 * (t_full - t_bb):.1f} ms')

    cls_scores, pose_preds, centernesses, _ = outs
    sf = jnp.ones((B, 2), jnp.float32)
    dec = jax.jit(lambda c, p, t, s: decode_batch(
        c, p, t, strides, s, J, dict(cfg.model.test_cfg)))
    t_dec, _ = timed(dec, cls_scores, pose_preds, centernesses, sf)
    print(f'decode:        {t_dec * 1e3:.1f} ms')


if __name__ == '__main__':
    main()
