"""On-chip train-step throughput for the exp_panoptic recipe
(BASELINE rung #5: pmap-parity with the 4-GPU recipe, B=16 global).

Synthetic batch, jitted SPMD step on the available devices; prints one
JSON line with step time and img/s. Run during quiet chip windows.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default='configs/das/exp_panoptic.py')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--height', type=int, default=512)
    ap.add_argument('--width', type=int, default=960)
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--groups', type=int, default=4)
    ap.add_argument('--dcn-mode', default=None,
                    help="override bbox_head dcn_gather_mode, e.g. "
                         "'clip' or 'shift:2'")
    ap.add_argument('--trace', action='store_true',
                    help='report device-trace op time instead of '
                         'wall clock (contention-immune)')
    ap.add_argument('--ru-mode', default=None,
                    help="RU sampling gather mode (A/B: 'clip' vs the "
                         "'auto'->patch default)")
    ap.add_argument('--dcn-train-mode', default=None,
                    help="override bbox_head dcn_train_gather_mode "
                         "(e.g. 'hybrid' = dense shift + cond repairs, "
                         "dense adjoint; default 'auto' -> clip gathers)")
    ap.add_argument('--sparse-refine', action='store_true',
                    help='train_cfg.sparse_refine: RU re-sampling only at '
                         'assigned positives (loss-bitwise-identical)')
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.models import build_model
    from das_tpu.parallel.train_step import (TrainState, make_lr_fn,
                                             make_optimizer,
                                             make_train_step,
                                             mspn_frozen_prefixes)

    cfg = Config.fromfile(args.config)
    mc = dict(cfg.model)
    if args.dcn_mode:
        mode, _, rad = args.dcn_mode.partition(':')
        mc['bbox_head'] = dict(mc['bbox_head'], dcn_gather_mode=mode,
                               **(dict(dcn_shift_radius=int(rad))
                                  if rad else {}))
    if args.ru_mode:
        mc['bbox_head'] = dict(
            mc['bbox_head'],
            recursive_update=dict(mc['bbox_head']['recursive_update'],
                                  gather_mode=args.ru_mode))
    if args.dcn_train_mode:
        mode, _, rad = args.dcn_train_mode.partition(':')
        mc['bbox_head'] = dict(mc['bbox_head'],
                               dcn_train_gather_mode=mode,
                               **(dict(dcn_shift_radius=int(rad))
                                  if rad else {}))
    if args.sparse_refine:
        mc['train_cfg'] = dict(mc.get('train_cfg') or {},
                               sparse_refine=True)
    model = build_model(mc, dtype=jnp.bfloat16)
    B, H, W = args.batch, args.height, args.width
    variables = dict(model.init_all(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3))))
    head = cfg.model.bbox_head
    J = int(head.num_joints)
    featmaps = [(H // (4 * 2 ** i), W // (4 * 2 ** i)) for i in range(4)]

    lr_fn = make_lr_fn(2e-3, steps_per_epoch=1000)
    tx_init, tx_update = make_optimizer(
        variables['params'], lr_fn,
        frozen_prefixes=mspn_frozen_prefixes(1))
    state = TrainState(jnp.zeros((), jnp.int32), variables['params'],
                       variables['batch_stats'],
                       tx_init(variables['params']))

    step_fn = make_train_step(
        model, tx_update, featmaps, tuple(head.strides),
        tuple(tuple(r) for r in head.regress_ranges), J,
        max_pos=128 * B, donate=True)

    rng = np.random.RandomState(0)
    G = 8
    batch = dict(
        img=jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        gt_poses_3d=jnp.asarray(rng.randn(B, G, 3 + 4 * J), jnp.float32),
        gt_centers2d=jnp.asarray(
            rng.uniform(32, min(H, W) - 32, (B, G, 2)), jnp.float32),
        gt_depths=jnp.asarray(rng.uniform(1, 3, (B, G)), jnp.float32),
        gt_valid=jnp.ones((B, G), bool))

    # Chain the steps INSIDE one jit program — the axon tunnel costs
    # ~90 ms relay latency per dispatch (an artifact of this dev env, not
    # the chip). The optimizer state carries the loop dependency.
    iters = args.iters

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_group(state, batch):
        def body(_, s):
            s, _m = step_fn(s, batch)
            return s
        state = jax.lax.fori_loop(0, iters - 1, body, state)
        return step_fn(state, batch)

    state, metrics = run_group(state, batch)
    _ = float(np.asarray(metrics['loss']))     # compile + force completion

    if args.trace:
        # device-side truth: sum the program's own XLA-op intervals —
        # valid even when the time-shared chip makes wall-clock readings
        # contention-polluted (10-20x observed)
        import glob
        import gzip
        import json as _json
        logdir = '/tmp/das_tpu_train_trace'
        os.system(f'rm -rf {logdir}')
        # host/python tracing OFF: the Chrome-trace exporter caps at 1e6
        # events and host python spans flooded the cap, dropping every
        # device op from the export (observed on this terminal build)
        opts = jax.profiler.ProfileOptions()
        opts.host_tracer_level = 0
        opts.python_tracer_level = 0
        jax.profiler.start_trace(logdir, profiler_options=opts)
        state, metrics = run_group(state, batch)
        _ = float(np.asarray(metrics['loss']))
        jax.profiler.stop_trace()
        tr = glob.glob(f'{logdir}/plugins/profile/*/*.trace.json.gz')
        with gzip.open(tr[0]) as f:
            evs = _json.load(f)['traceEvents']
        # sum across EVERY TPU process's "XLA Ops" thread: the tunneled
        # backend has been seen splitting metadata and events across
        # pids, which zeroed a first-pid-only sum
        tpu_pids = {e['pid'] for e in evs
                    if e.get('ph') == 'M'
                    and e.get('name') == 'process_name'
                    and 'TPU' in str(e['args'].get('name', ''))}
        ops_tids = {(e['pid'], e['tid']) for e in evs
                    if e.get('ph') == 'M'
                    and e.get('name') == 'thread_name'
                    and e.get('pid') in tpu_pids
                    and e['args'].get('name') == 'XLA Ops'}
        dev_us = sum(e['dur'] for e in evs if e.get('ph') == 'X'
                     and (e.get('pid'), e.get('tid')) in ops_tids)
        if dev_us == 0:
            names = sorted({(e['pid'], str(e['args'].get('name')))
                            for e in evs if e.get('ph') == 'M'
                            and e.get('name') == 'thread_name'
                            and e.get('pid') in tpu_pids})
            raise RuntimeError(
                f'trace has no XLA Ops events; TPU pids={sorted(tpu_pids)}'
                f' threads={names[:20]}')
        dev_ms = dev_us / 1e3 / iters
        print(json.dumps(dict(metric='train_step_device_ms',
                              step_ms=round(dev_ms, 1),
                              img_per_s=round(B / (dev_ms / 1e3), 2),
                              batch=B, hw=[H, W],
                              loss=float(np.asarray(metrics['loss'])))))
        # per-source attribution (same method as device_profile.py)
        from collections import defaultdict
        by_src = defaultdict(float)
        for e in evs:
            if e.get('ph') == 'X' and (e.get('pid'),
                                       e.get('tid')) in ops_tids:
                a = e.get('args', {})
                frames = [ln for ln in a.get('source_stack',
                                             '').split('\n') if ln]
                das = [f for f in frames if '/das_tpu/' in f]
                key = (das[0] if das else a.get('source', '?')
                       ).split('/')[-1]
                by_src[key] += e['dur']
        for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:15]:
            print(f'#   {k[:64]:64s} {v / 1e3 / iters:9.2f} ms/step '
                  f'{100 * v / dev_us:5.1f}%')
        return

    best = float('inf')
    for _ in range(args.groups):
        t0 = time.perf_counter()
        state, metrics = run_group(state, batch)
        _ = float(np.asarray(metrics['loss']))
        best = min(best, (time.perf_counter() - t0) / iters)
        time.sleep(2.0)
    print(json.dumps(dict(step_ms=round(best * 1e3, 1),
                          img_per_s=round(B / best, 2),
                          batch=B, hw=[H, W],
                          loss=float(np.asarray(metrics['loss'])))))


if __name__ == '__main__':
    main()
