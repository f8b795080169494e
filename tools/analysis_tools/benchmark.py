"""Inference throughput harness (ref: tools/analysis_tools/benchmark.py).

Measures img/s of the fused forward+decode program over N iterations at a
given resolution, batch 1 by default (the reference's protocol: 2000
samples, batch 1).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config', nargs='?',
                        default='configs/das/exp_panoptic.py')
    parser.add_argument('--samples', type=int, default=200)
    parser.add_argument('--batch-size', type=int, default=1)
    parser.add_argument('--height', type=int, default=640)
    parser.add_argument('--width', type=int, default=1152)
    parser.add_argument('--log-interval', type=int, default=50)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.apis.inference import init_model, make_predict_fn

    cfg = Config.fromfile(args.config)
    model, variables, cfg = init_model(cfg, dtype=jnp.bfloat16)
    head = cfg.model.bbox_head
    predict = make_predict_fn(model, dict(cfg.model.test_cfg),
                              int(head.num_joints), tuple(head.strides))

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(args.batch_size, args.height, args.width, 3),
                      jnp.float32)
    sf = jnp.ones((args.batch_size, 2), jnp.float32)

    jax.block_until_ready(predict(variables, img, sf))  # compile

    t0 = time.perf_counter()
    n_done = 0
    for i in range(args.samples):
        out = predict(variables, img, sf)
        n_done += args.batch_size
        if (i + 1) % args.log_interval == 0:
            jax.block_until_ready(out)
            fps = n_done / (time.perf_counter() - t0)
            print(f'[{i + 1}/{args.samples}] {fps:.2f} img/s')
    jax.block_until_ready(out)
    fps = n_done / (time.perf_counter() - t0)
    print(f'Overall: {fps:.2f} img/s '
          f'({args.height}x{args.width}, batch {args.batch_size})')


if __name__ == '__main__':
    main()
