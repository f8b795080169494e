"""Strip training state and stamp a content hash into the filename
(ref tools/model_converters/publish_model.py)."""
import argparse
import hashlib
import subprocess


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('in_file')
    ap.add_argument('out_file')
    args = ap.parse_args()

    import torch
    ckpt = torch.load(args.in_file, map_location='cpu',
                      weights_only=False)
    # remove optimizer state for publication (ref :18-21)
    ckpt.pop('optimizer', None)
    out = args.out_file
    if out.endswith('.pth'):
        out = out[:-4]
    torch.save(ckpt, out + '.pth')
    with open(out + '.pth', 'rb') as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    final = f'{out}-{sha[:8]}.pth'
    subprocess.check_call(['mv', out + '.pth', final])
    print(f'wrote {final}')


if __name__ == '__main__':
    main()
