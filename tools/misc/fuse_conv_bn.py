"""Fuse conv+bn of a checkpoint and save the fused weights
(ref tools/misc/fuse_conv_bn.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('checkpoint', help='torch .pth checkpoint')
    ap.add_argument('out', help='output fused .pth path')
    args = ap.parse_args()

    from das_tpu.apis.inference import init_model
    from das_tpu.models.fuse import fuse_conv_bn
    from das_tpu.checkpoint.torch_bridge import save_torch_checkpoint

    model, variables, cfg = init_model(args.config, args.checkpoint)
    variables, n = fuse_conv_bn(variables)
    print(f'fused {n} conv+bn pairs')
    save_torch_checkpoint(variables, args.out,
                          meta=dict(fused_conv_bn=True))
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
