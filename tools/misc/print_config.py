"""Print the fully-resolved config (ref tools/misc/print_config.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def main():
    ap = argparse.ArgumentParser(description='Print the whole config')
    ap.add_argument('config')
    ap.add_argument('--cfg-options', nargs='+', default=None)
    args = ap.parse_args()

    from das_tpu.config import Config
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        from tools.train import parse_cfg_options
        cfg.merge_from_dict(parse_cfg_options(args.cfg_options))
    print(f'Config:\n{cfg.dump()}')


if __name__ == '__main__':
    main()
