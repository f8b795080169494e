"""Training-log analysis (ref: tools/analysis_tools/analyze_logs.py).

Consumes the jsonl metric streams MetricLogger writes and prints loss
curves / timing summaries (plot to file when matplotlib is available).
"""

import argparse
import json


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('task', choices=['plot_curve', 'cal_train_time'])
    parser.add_argument('jsonl', nargs='+')
    parser.add_argument('--keys', nargs='+', default=['loss'])
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    for path in args.jsonl:
        rows = load(path)
        if not rows:
            print(f'{path}: empty')
            continue
        if args.task == 'cal_train_time':
            ips = [r['img_per_s'] for r in rows if 'img_per_s' in r]
            if ips:
                print(f'{path}: mean {sum(ips) / len(ips):.2f} img/s, '
                      f'max {max(ips):.2f}, min {min(ips):.2f}')
            continue
        for key in args.keys:
            series = [(r['step'], r[key]) for r in rows if key in r]
            if not series:
                continue
            steps, vals = zip(*series)
            print(f'{path} {key}: first {vals[0]:.4f} @ {steps[0]}, '
                  f'last {vals[-1]:.4f} @ {steps[-1]}, '
                  f'min {min(vals):.4f}')
            if args.out:
                try:
                    import matplotlib
                    matplotlib.use('Agg')
                    import matplotlib.pyplot as plt
                    plt.plot(steps, vals, label=f'{key}')
                    plt.legend()
                    plt.savefig(args.out)
                    print(f'saved {args.out}')
                except ImportError:
                    pass


if __name__ == '__main__':
    main()
