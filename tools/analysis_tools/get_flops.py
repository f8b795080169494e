"""Model FLOPs/params report (ref: tools/analysis_tools/get_flops.py,
which used the mmcv flops counter). Here XLA's own cost analysis reports
the compiled program's FLOPs — more truthful than layer-walking since it
counts what actually runs after fusion.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config', nargs='?',
                        default='configs/das/exp_panoptic.py')
    parser.add_argument('--shape', type=int, nargs=2, default=[640, 1152])
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.models import build_model

    cfg = Config.fromfile(args.config)
    model = build_model(dict(cfg.model))
    h, w = args.shape
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)

    n_params = sum(np.prod(p.shape)
                   for p in jax.tree.leaves(variables['params']))

    lowered = jax.jit(
        lambda v, x: model.apply(v, x, train=False)).lower(variables, img)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get('flops', float('nan'))
    print(f'Input shape: (1, {h}, {w}, 3)')
    print(f'Params: {n_params / 1e6:.2f} M')
    print(f'FLOPs (XLA cost analysis): {flops / 1e9:.2f} GFLOPs')


if __name__ == '__main__':
    main()
