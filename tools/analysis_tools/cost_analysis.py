"""Analytical cost breakdown of the inference program via XLA.

Compiles backbone+neck / head / decode separately for the current backend
and prints FLOPs, bytes accessed, and speed-of-light times against peak
MXU FLOPs and HBM bandwidth — contention-free guidance for optimization
(the time-shared chip makes wall-clock microbenchmarks unreliable).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

# v5e peaks (public: 197 bf16 TFLOP/s — the oft-quoted 394 figure is
# int8 TOPS — and 819 GB/s HBM)
PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9


def analyze(name, fn, *args):
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get('flops', 0.0)
    bytes_ = ca.get('bytes accessed', 0.0)
    t_flops = flops / PEAK_FLOPS
    t_bytes = bytes_ / PEAK_BYTES
    sol = max(t_flops, t_bytes)
    bound = 'compute' if t_flops > t_bytes else 'memory'
    print(f'{name:16s} {flops / 1e9:9.1f} GFLOP {bytes_ / 1e9:8.2f} GB '
          f'SOL {sol * 1e3:7.2f} ms ({bound}-bound; '
          f'flops {t_flops * 1e3:.2f} ms / bytes {t_bytes * 1e3:.2f} ms)')
    return dict(flops=flops, bytes=bytes_, sol=sol)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--height', type=int, default=640)
    parser.add_argument('--width', type=int, default=1152)
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--measured-ms', type=float, default=None,
                        help='measured wall ms/batch for this program '
                             '(quiet window) -> prints MFU%% and HBM%%')
    parser.add_argument('--dcn-mode', default=None,
                        help='override bbox_head dcn_gather_mode')
    parser.add_argument('--train', action='store_true',
                        help='analyze the full TRAIN step (fwd+bwd+opt) '
                             'instead of the inference forward; pair '
                             'with --measured-ms from train_bench '
                             '--trace for train-mode MFU/HBM')
    parser.add_argument('--dcn-train-mode', default=None,
                        help="with --train: dcn_train_gather_mode "
                             "override (e.g. 'hybrid:1')")
    parser.add_argument('--sparse-refine', action='store_true',
                        help='with --train: train_cfg.sparse_refine')
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
    mc = dict(cfg.model)
    if args.dcn_mode:
        mode, _, rad = args.dcn_mode.partition(':')
        mc['bbox_head'] = dict(mc['bbox_head'], dcn_gather_mode=mode,
                               **(dict(dcn_shift_radius=int(rad))
                                  if rad else {}))
    if args.dcn_train_mode:
        mode, _, rad = args.dcn_train_mode.partition(':')
        mc['bbox_head'] = dict(mc['bbox_head'],
                               dcn_train_gather_mode=mode,
                               **(dict(dcn_shift_radius=int(rad))
                                  if rad else {}))
    if args.sparse_refine:
        mc['train_cfg'] = dict(mc.get('train_cfg') or {},
                               sparse_refine=True)
    model = build_model(mc, dtype=dtype)
    B, H, W = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3))))
    head = cfg.model.bbox_head
    strides = tuple(head.strides)
    J = int(head.num_joints)

    if args.train:
        from das_tpu.parallel.train_step import (TrainState, make_lr_fn,
                                                 make_optimizer,
                                                 make_train_step,
                                                 mspn_frozen_prefixes)
        lr_fn = make_lr_fn(2e-3, steps_per_epoch=1000)
        tx_init, tx_update = make_optimizer(
            variables['params'], lr_fn,
            frozen_prefixes=mspn_frozen_prefixes(1))
        state = TrainState(jnp.zeros((), jnp.int32), variables['params'],
                           variables['batch_stats'],
                           tx_init(variables['params']))
        featmaps = [(H // (4 * 2 ** i), W // (4 * 2 ** i))
                    for i in range(4)]
        step_fn = make_train_step(
            model, tx_update, featmaps, strides,
            tuple(tuple(r) for r in head.regress_ranges), J,
            max_pos=128 * B, donate=False)
        G = 8
        batch = dict(
            img=img,
            gt_poses_3d=jnp.asarray(rng.randn(B, G, 3 + 4 * J),
                                    jnp.float32),
            gt_centers2d=jnp.asarray(
                rng.uniform(32, min(H, W) - 32, (B, G, 2)), jnp.float32),
            gt_depths=jnp.asarray(rng.uniform(1, 3, (B, G)), jnp.float32),
            gt_valid=jnp.ones((B, G), bool))
        r = analyze('train step', step_fn, state, batch)
        if args.measured_ms is not None:
            t = args.measured_ms / 1e3
            print(f'measured {args.measured_ms:.1f} ms/step -> '
                  f'train MFU {100 * r["flops"] / t / PEAK_FLOPS:.1f}%  '
                  f'HBM {100 * r["bytes"] / t / PEAK_BYTES:.1f}% '
                  f'(bytes-accessed overcounts fused operands; device '
                  f'trace is the traffic truth)')
        return

    def backbone(v, x):
        return model.apply(v, x, False, method=type(model).extract_feat)

    def full(v, x):
        return model.apply(v, x, train=False)

    r_bb = analyze('backbone+neck', backbone, variables, img)
    r_full = analyze('full forward', full, variables, img)
    print(f'{"head (delta)":16s} {(r_full["flops"] - r_bb["flops"]) / 1e9:9.1f} GFLOP '
          f'{(r_full["bytes"] - r_bb["bytes"]) / 1e9:8.2f} GB')

    outs = jax.eval_shape(full, variables, img)
    cls_s = [jnp.zeros(o.shape, o.dtype) for o in outs[0]]
    pose_s = [jnp.zeros(o.shape, o.dtype) for o in outs[1]]
    ctr_s = [jnp.zeros(o.shape, o.dtype) for o in outs[2]]
    sf = jnp.ones((B, 2), jnp.float32)
    analyze('decode', lambda c, p, t, s: decode_batch(
        c, p, t, strides, s, J, dict(cfg.model.test_cfg)),
        cls_s, pose_s, ctr_s, sf)

    tot = r_full['sol']
    print(f'\nfull-forward SOL {tot * 1e3:.2f} ms -> '
          f'{B / tot:.0f} img/s speed-of-light '
          f'(quiet-chip round-1 measured ~30 img/s)')

    if args.measured_ms is not None:
        t = args.measured_ms / 1e3
        mfu = r_full['flops'] / t / PEAK_FLOPS
        hbm = r_full['bytes'] / t / PEAK_BYTES
        print(f'measured {args.measured_ms:.1f} ms/batch -> '
              f'MFU {100 * mfu:.1f}%  HBM {100 * hbm:.1f}%  '
              f'(SOL ratio {tot / t * 100:.1f}% — the gap is time in '
              f'ops XLA prices below the roofline: gathers/selects)')


if __name__ == '__main__':
    main()
