"""Evaluation CLI (ref: tools/test.py).

Usage:
    python tools/test.py configs/das/exp_panoptic.py CKPT --eval mpjpe
CKPT may be a torch .pth (loaded via the bridge) or an orbax directory.
"""

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser(description='Evaluate a DAS-TPU model')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--eval', nargs='+', default=['mpjpe'])
    parser.add_argument('--batch-size', type=int, default=4)
    parser.add_argument('--out', default=None,
                        help='pickle the raw outputs here')
    parser.add_argument('--format-only', action='store_true',
                        help='write result_keypoints.json and skip '
                             'evaluation (ref tools/test.py:33,214-218)')
    parser.add_argument('--res-folder', default='tmp',
                        help='folder for result_keypoints.json (the '
                             "reference's evaluate res_folder, default "
                             "'tmp')")
    parser.add_argument('--cfg-options', nargs='+', default=None)
    parser.add_argument('--fuse-conv-bn', action='store_true',
                        help='fold BN into convs before inference '
                             '(ref tools/test.py:175-176)')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.apis.inference import init_model
    from das_tpu.apis.test import run_test
    from das_tpu.datasets import build_dataset

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        from tools.train import parse_cfg_options
        cfg.merge_from_dict(parse_cfg_options(args.cfg_options))

    model, variables, cfg = init_model(cfg, checkpoint=args.checkpoint,
                                       dtype=jnp.bfloat16)
    if args.fuse_conv_bn:
        from das_tpu.models.fuse import fuse_conv_bn
        variables, n = fuse_conv_bn(variables)
        print(f'[das_tpu] fused {n} conv+bn pairs')
    dataset = build_dataset(cfg.data['test'])
    outputs = run_test(model, variables, dataset, cfg,
                       batch_size=args.batch_size)
    if args.out:
        import pickle
        with open(args.out, 'wb') as f:
            pickle.dump(outputs, f)
    if args.format_only:
        _, res_file = dataset.format_results(outputs,
                                             res_folder=args.res_folder)
        print(f'[das_tpu] wrote {res_file}')
        return
    results = dataset.evaluate(outputs, metric=args.eval,
                               res_folder=args.res_folder)
    for k, v in results.items():
        print(k, v)


if __name__ == '__main__':
    main()
