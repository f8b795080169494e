"""Capture a device trace of the fused inference program and print the
per-op time breakdown (grouped by op category), using the tensorboard
profile plugin to parse the xplane.

Device-side timings are valid even when the chip is time-shared (they
measure our program's own execution intervals).
"""

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--height', type=int, default=640)
    parser.add_argument('--width', type=int, default=1152)
    parser.add_argument('--batch', type=int, default=4)
    parser.add_argument('--logdir', default='/tmp/das_tpu_trace')
    parser.add_argument('--top', type=int, default=40)
    parser.add_argument('--dcn-mode', default=None,
                        help="override dcn_gather_mode, e.g. 'hybrid:1'")
    parser.add_argument('--fused-gn', action='store_true',
                        help='enable the fused conv+GN+relu tower kernel')
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.models import build_model
    from das_tpu.core.decode import decode_batch

    cfg = Config.fromfile('configs/das/exp_panoptic.py')
    mc = dict(cfg.model)
    if args.dcn_mode:
        mode, _, rad = args.dcn_mode.partition(':')
        mc['bbox_head'] = dict(mc['bbox_head'], dcn_gather_mode=mode,
                               **(dict(dcn_shift_radius=int(rad))
                                  if rad else {}))
    if args.fused_gn:
        mc['bbox_head'] = dict(mc['bbox_head'], fused_gn=True)
    model = build_model(mc, dtype=jnp.bfloat16)
    B, H, W = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3))))
    head = cfg.model.bbox_head
    strides = tuple(head.strides)
    J = int(head.num_joints)

    @jax.jit
    def predict(v, x, sf):
        cls, pose, ctr, _ = model.apply(v, x, train=False)
        return decode_batch(cls, pose, ctr, strides, sf, J,
                            dict(cfg.model.test_cfg))

    sf = jnp.full((B, 2), 0.593, jnp.float32)
    out = predict(variables, img, sf)
    jax.block_until_ready(out)

    os.system(f'rm -rf {args.logdir}')
    # host/python tracing OFF: host spans can flood the Chrome-trace
    # exporter's 1e6-event cap and drop every device op (observed)
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = 0
    opts.python_tracer_level = 0
    jax.profiler.start_trace(args.logdir, profiler_options=opts)
    for _ in range(3):
        out = predict(variables, img, sf)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    # parse the Chrome-trace json directly (the tensorboard-plugin-profile
    # parse path is broken by a protobuf version mismatch in this image)
    import gzip
    import re
    from collections import defaultdict
    traces = glob.glob(f'{args.logdir}/plugins/profile/*/*.trace.json.gz')
    assert traces, f'no trace under {args.logdir}'
    with gzip.open(traces[0]) as f:
        evs = json.load(f)['traceEvents']
    # TPU pid / "XLA Ops" tid
    tpu_pid = next(e['pid'] for e in evs
                   if e.get('ph') == 'M' and e.get('name') == 'process_name'
                   and 'TPU' in str(e['args'].get('name', '')))
    ops_tid = next(e['tid'] for e in evs
                   if e.get('ph') == 'M' and e.get('name') == 'thread_name'
                   and e.get('pid') == tpu_pid
                   and e['args'].get('name') == 'XLA Ops')
    ops = [e for e in evs if e.get('ph') == 'X'
           and e.get('pid') == tpu_pid and e.get('tid') == ops_tid]

    by_src = defaultdict(float)
    by_name = defaultdict(lambda: [0, 0.0, ''])
    total = 0.0
    for e in ops:
        a = e.get('args', {})
        src = a.get('source', '?')
        frames = [ln for ln in a.get('source_stack', '').split('\n') if ln]
        # most informative frame: deepest das_tpu frame
        das = [f for f in frames if '/das_tpu/' in f]
        key = (das[0] if das else src).split('/')[-1]
        by_src[key] += e['dur']
        by_name[e['name']][0] += 1
        by_name[e['name']][1] += e['dur']
        by_name[e['name']][2] = key
        total += e['dur']

    print(f'\n== time by source line (3 runs, total {total / 3e3:.1f} '
          f'ms/run) ==')
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f'{k[:64]:64s} {v / 3e3:9.2f} ms/run {100 * v / total:5.1f}%')

    print('\n== top individual ops ==')
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][1])[:args.top]
    for k, (c, v, src) in rows:
        print(f'{k[:48]:48s} x{c:<4d} {v / 3e3:9.2f} ms/run  {src[:40]}')


if __name__ == '__main__':
    main()
