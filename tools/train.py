"""Training CLI (ref: tools/train.py:94-220).

Usage:
    python tools/train.py configs/das/exp_panoptic.py \
        [--work-dir DIR] [--resume-from CKPT] [--seed N] \
        [--max-steps N] [--cfg-options k=v ...]

Multi-chip: no torch.distributed.launch equivalent is needed — one process
drives all local TPU devices through the mesh (SPMD); multi-host pods call
``jax.distributed.initialize`` first (--multihost).
"""

import argparse
import ast
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_cfg_options(pairs):
    out = {}
    for pair in pairs or []:
        k, v = pair.split('=', 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def main():
    parser = argparse.ArgumentParser(description='Train a DAS-TPU model')
    parser.add_argument('config')
    parser.add_argument('--work-dir', default=None)
    parser.add_argument('--resume-from', default=None)
    parser.add_argument('--load-from', default=None)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--max-steps', type=int, default=None)
    parser.add_argument('--multihost', action='store_true',
                        help='call jax.distributed.initialize() for pods')
    parser.add_argument('--autoscale-lr', action='store_true',
                        help='linear lr scaling by chip count '
                             '(ref tools/train.py:75-78)')
    parser.add_argument('--cfg-options', nargs='+', default=None)
    args = parser.parse_args()

    if args.multihost:
        import jax
        jax.distributed.initialize()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/das_tpu_jax_cache')

    from das_tpu.config import Config
    from das_tpu.apis.train import train_model

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    if args.autoscale_lr:
        # reference rule: lr scales linearly with world size / 8
        cfg['optimizer']['lr'] = cfg.optimizer['lr'] * \
            jax.device_count() / 8

    work_dir = args.work_dir or os.path.join(
        'work_dirs', os.path.splitext(os.path.basename(args.config))[0])
    train_model(cfg, work_dir=work_dir, resume_from=args.resume_from,
                load_from=args.load_from, seed=args.seed,
                max_steps=args.max_steps)


if __name__ == '__main__':
    main()
