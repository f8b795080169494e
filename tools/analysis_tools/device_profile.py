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
    model = build_model(dict(cfg.model), dtype=jnp.bfloat16)
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
    jax.profiler.start_trace(args.logdir)
    for _ in range(3):
        out = predict(variables, img, sf)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    # parse xplane -> op profile via the tensorboard plugin
    xplanes = glob.glob(
        f'{args.logdir}/plugins/profile/*/*.xplane.pb')
    assert xplanes, f'no xplane under {args.logdir}'
    xplane = xplanes[0]
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xplane], 'framework_op_stats', {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data) if data.lstrip().startswith('[') else None
    if rows is None:
        # gviz csv fallback
        print(data[:2000])
        return

    # rows: list of dicts with 'category'/'operation'/'total_self_time'...
    print(json.dumps(rows[:3], indent=1)[:1500])


if __name__ == '__main__':
    main()
