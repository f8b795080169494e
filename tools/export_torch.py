"""Export a das_tpu orbax checkpoint to a reference-layout torch .pth.

Embeds the reference's checkpoint meta (version, config text, CLASSES —
ref tools/train.py:200-210) so the file round-trips through mmcv-style
loaders.

Usage:
    python tools/export_torch.py CONFIG WORK_DIR/ckpts OUT.pth [--step N]
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('ckpt_dir')
    ap.add_argument('out')
    ap.add_argument('--step', default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import das_tpu
    from das_tpu.apis.inference import init_model
    from das_tpu.checkpoint.orbax_io import CheckpointManager
    from das_tpu.checkpoint.torch_bridge import save_torch_checkpoint
    from das_tpu.parallel.train_step import (TrainState, make_lr_fn,
                                             make_optimizer)

    model, variables, cfg = init_model(args.config)
    manager = CheckpointManager(args.ckpt_dir)
    # the saved tree is a full TrainState; rebuild a structurally
    # identical target (optimizer hyperparams don't affect structure)
    tx_init, _ = make_optimizer(variables['params'], make_lr_fn(2e-3))
    target = TrainState(step=jnp.zeros((), jnp.int32),
                        params=variables['params'],
                        batch_stats=variables['batch_stats'],
                        opt_state=tx_init(variables['params']))
    restored = manager.restore(target, args.step)
    variables = dict(params=restored.params,
                     batch_stats=restored.batch_stats)
    meta = dict(das_tpu_version=das_tpu.__version__,
                time=time.asctime(),
                config=cfg.dump(),
                CLASSES=('person',))
    save_torch_checkpoint(variables, args.out, meta=meta)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
