"""E2E inference timing sweep over DCN tap-fetch lowerings.

Builds the flagship exp_panoptic model once per mode (patch gathers vs
the gather-free dense-shift formulation at several radii) and times the
fused forward+decode program with the same chained-dispatch protocol as
bench.py (the axon tunnel costs ~90 ms per dispatch; chaining hides it).

The shift mode is exact only while learned DCN offsets stay within
+-radius px (zero-init offsets — the bench condition — are exactly 0),
so this is a perf experiment surface, not a default-changing tool.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def time_mode(mode, radius, H, W, B, groups, group, ru_mode=None,
              fused_gn=False):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from das_tpu.config import Config
    from das_tpu.models import build_model
    from das_tpu.core.decode import decode_batch

    cfg = Config.fromfile('configs/das/exp_panoptic.py')
    mc = dict(cfg.model)
    mc['bbox_head'] = dict(mc['bbox_head'], dcn_gather_mode=mode,
                           dcn_shift_radius=radius)
    if ru_mode:
        mc['bbox_head'] = dict(
            mc['bbox_head'],
            recursive_update=dict(mc['bbox_head']['recursive_update'],
                                  gather_mode=ru_mode))
    if fused_gn:
        mc['bbox_head'] = dict(mc['bbox_head'], fused_gn=True)
    model = build_model(mc, dtype=jnp.bfloat16)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(0), img0))
    head = cfg.model.bbox_head
    strides = tuple(head.strides)
    J = int(head.num_joints)
    test_cfg = dict(cfg.model.test_cfg)

    @jax.jit
    def predict(variables, img, sf):
        cls_scores, pose_preds, centernesses, _ = model.apply(
            variables, img, train=False)
        return decode_batch(cls_scores, pose_preds, centernesses,
                            strides, sf, J, test_cfg)

    @jax.jit
    def run_group(variables, img, sf):
        def body(_, img):
            out = predict(variables, img, sf)
            eps = (out['scores'].ravel()[:1] * 1e-20).astype(img.dtype)
            return img + eps
        img = jax.lax.fori_loop(0, group - 1, body, img)
        return predict(variables, img, sf)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    sf = jnp.full((B, 2), 0.593, jnp.float32)

    out = run_group(variables, img, sf)      # compile
    np.asarray(out['scores'])

    best = float('inf')
    for g in range(groups):
        img = img + 1e-4
        t0 = time.perf_counter()
        out = run_group(variables, img, sf)
        np.asarray(out['scores'])
        best = min(best, time.perf_counter() - t0)
        if g < groups - 1:
            time.sleep(min(5.0, best))
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--height', type=int, default=640)
    parser.add_argument('--width', type=int, default=1152)
    parser.add_argument('--batch-size', type=int, default=4)
    parser.add_argument('--groups', type=int, default=8)
    parser.add_argument('--group', type=int, default=8)
    parser.add_argument('--modes', default='patch,shift:1,shift:2')
    parser.add_argument('--ru-mode', default=None,
                        help="recursive-update sampling gather mode "
                             "(default: config 'auto' -> clip)")
    parser.add_argument('--fused-gn', action='store_true',
                        help='enable the fused conv+GN+relu tower kernel')
    args = parser.parse_args()

    import jax
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    for spec in args.modes.split(','):
        mode, _, rad = spec.partition(':')
        radius = int(rad) if rad else 2
        dt = time_mode(mode, radius, args.height, args.width,
                       args.batch_size, args.groups, args.group,
                       ru_mode=args.ru_mode, fused_gn=args.fused_gn)
        fps = args.batch_size * args.group / dt
        print(f'{spec:12s}  best group {dt * 1e3:8.1f} ms   '
              f'{fps:7.2f} img/s', flush=True)


if __name__ == '__main__':
    main()
