"""Validate a checkpoint for the 'shift'/'hybrid' DCN lowerings.

The gather-free lowerings are exact only while learned tap offsets stay
inside the +-radius box ('shift') or while at most ``--budget`` pixels
per image have any out-of-radius tap ('hybrid' — those pixels are
repaired exactly; see das_tpu/ops/deform_conv.py). Before trusting
either mode's outputs for a trained checkpoint, run this: it forwards
sample images with ``mutable=['intermediates']``, collects every DCN
layer's offset field (sown in ``DeformConv2d``), and reports per layer

  max |offset|            -> smallest radius that keeps 'shift' exact
  flagged pixels / image  -> smallest budget that keeps 'hybrid' exact

Exit code 0 iff the ``--mode`` condition holds: 'hybrid' (default) needs
every layer's flagged-pixel count <= --budget; 'shift' needs every
layer's max |offset| <= --radius; 'both' needs both.

Usage:
    python tools/validate_hybrid.py --ckpt work/latest.pth \
        [--radius 2] [--budget 2048] [--images img1.jpg ...]
Random-normal inputs are used when no images are given (init offsets are
zero; a trained checkpoint needs real-ish inputs for a meaningful
bound, but random inputs still exercise trained conv_offset weights).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', default='configs/das/exp_panoptic.py')
    p.add_argument('--ckpt', default=None,
                   help='.pth (torch bridge) or orbax dir; random init '
                        'if omitted')
    p.add_argument('--images', nargs='*', default=None)
    p.add_argument('--height', type=int, default=512)
    p.add_argument('--width', type=int, default=960)
    p.add_argument('--radius', type=int, default=2)
    p.add_argument('--budget', type=int, default=2048)
    p.add_argument('--mode', choices=('shift', 'hybrid', 'both'),
                   default='hybrid',
                   help='which lowering the exit code certifies')
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from das_tpu.config import Config
    from das_tpu.models import build_model
    from das_tpu.ops.deform_conv import deform_offset_overflow

    cfg = Config.fromfile(args.config)
    model = build_model(dict(cfg.model))
    variables = dict(model.init_all(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3))))
    if args.ckpt and args.ckpt.endswith('.pth'):
        from das_tpu.checkpoint.torch_bridge import load_torch_checkpoint
        variables, report = load_torch_checkpoint(variables, args.ckpt)
        print(f'loaded {args.ckpt}: missing={len(report["missing"])} '
              f'unexpected={len(report["unexpected"])}')
    elif args.ckpt:
        from das_tpu.checkpoint.orbax_io import restore_checkpoint
        variables = restore_checkpoint(args.ckpt, variables)

    if args.images:
        import cv2
        imgs = []
        for path in args.images:
            im = cv2.imread(path)[..., ::-1].astype(np.float32)
            im = cv2.resize(im, (args.width, args.height))
            imgs.append((im - 127.5) / 58.0)
        img = jnp.asarray(np.stack(imgs))
    else:
        rng = np.random.RandomState(0)
        img = jnp.asarray(
            rng.randn(2, args.height, args.width, 3), jnp.float32)

    @jax.jit
    def fwd(v, x):
        _, inter = model.apply(v, x, train=False,
                               mutable=['intermediates'])
        return inter['intermediates']

    inter = fwd(variables, img)
    flat = jax.tree.leaves_with_path(inter)
    shift_ok = hybrid_ok = True
    print(f'{"layer":70s} {"max|off|":>9s} {"flagged/img":>12s}')
    for path, leaf in flat:
        name = '/'.join(getattr(k, 'key', str(k)) for k in path)
        if 'dcn_offset' not in name:
            continue
        off = np.asarray(leaf[0] if isinstance(leaf, tuple) else leaf,
                         np.float32)
        mx = float(np.abs(off).max())
        flagged = int(np.asarray(deform_offset_overflow(
            jnp.asarray(off), args.radius, budget=0)).max())
        shift_ok &= mx <= args.radius
        hybrid_ok &= flagged <= args.budget
        print(f'{name[:70]:70s} {mx:9.3f} {flagged:12d}'
              f'{"" if flagged <= args.budget else "  <-- EXCEEDS"}')
    print(f'\nshift(r={args.radius}) exact: '
          f'{"yes" if shift_ok else "NO"};  '
          f'hybrid(r={args.radius}, budget={args.budget}) exact: '
          f'{"yes" if hybrid_ok else "NO"}')
    ok = dict(shift=shift_ok, hybrid=hybrid_ok,
              both=shift_ok and hybrid_ok)[args.mode]
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
