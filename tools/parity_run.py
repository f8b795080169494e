"""One-command parity harness vs the released reference checkpoint.

Runs the BASELINE.md config ladder rungs #1-#3 the moment the assets
exist and emits ``PARITY.json``:

  rung 1: single Panoptic frame through the released ``.pth``
          (per-frame MPJPE + decoded person count),
  rung 2: MuPoTS TS1 batched inference + flip-test + 3DPCK,
  rung 3: full Panoptic test sweep ``--eval mpjpe``.

Reference surfaces: evaluator
``/root/reference/mmdet3d/datasets/cmupanoptic_mono_dataset.py:372-424``,
MuPoTS PCK ``mupots_3dhp.py:436-473``; checkpoint link README.md:101.

Usage (all asset paths optional — rungs without assets are skipped and
recorded as such):

    python tools/parity_run.py --ckpt das_panoptic.pth \
        --panoptic-root data/panoptic --mupots-root data/mupots \
        --ref-mpjpe 62.3 --out PARITY.json

``--ref-mpjpe`` / ``--ref-pck`` are the numbers from a reference-repo run
of the same assets; when given, deltas are computed and the ±5 mm MPJPE
acceptance (BASELINE.md build targets) is checked.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--ckpt', required=True,
                   help='released torch .pth checkpoint')
    p.add_argument('--panoptic-root', default=None,
                   help="Panoptic data root (expects the reference's "
                        'annotations/*.json layout)')
    p.add_argument('--panoptic-ann', default=None,
                   help='override: explicit Panoptic test json')
    p.add_argument('--mupots-root', default=None,
                   help='MuPoTS data root (TS*/ + MultiPersonTestSet json)')
    p.add_argument('--mupots-ann', default=None,
                   help='override: explicit MuPoTS test json')
    p.add_argument('--config', default='configs/das/exp_panoptic.py')
    p.add_argument('--mupots-config', default='configs/das/exp_mupots.py')
    p.add_argument('--batch-size', type=int, default=4)
    p.add_argument('--rungs', default='1,2,3')
    p.add_argument('--flip-test', action=argparse.BooleanOptionalAction,
                   default=True,
                   help='rung-2 flip-test augmentation (--no-flip-test '
                        'to disable; reference MuPoTS eval uses it)')
    p.add_argument('--ref-mpjpe', type=float, default=None,
                   help='reference-run Panoptic MPJPE (mm) for the delta')
    p.add_argument('--ref-pck', type=float, default=None,
                   help='reference-run MuPoTS TS1 PCK_MEAN (%%) for delta')
    p.add_argument('--out', default='PARITY.json')
    return p.parse_args()


def _dataset_cfg(cfg, ann_file, data_root):
    d = dict(cfg.data['test'])
    if data_root:
        d['data_root'] = data_root
        # re-root relative annotation/prefix paths onto the given root
        for key in ('ann_file', 'img_prefix'):
            v = d.get(key)
            if v and not os.path.isabs(v):
                parts = v.split('/')
                # configs use 'data/<set>/...' — strip that prefix
                if len(parts) > 2 and parts[0] == 'data':
                    d[key] = os.path.join(data_root, *parts[2:])
    if ann_file:
        d['ann_file'] = ann_file
    return d


def run_rung(model, variables, cfg, ds_cfg, batch_size, metric,
             limit=None, eval_kwargs=None):
    from das_tpu.apis.test import run_test
    from das_tpu.datasets import build_dataset

    dataset = build_dataset(ds_cfg)
    if limit is not None and len(dataset) > limit:
        dataset.img_ids = dataset.img_ids[:limit]
        dataset.data_infos = dataset.data_infos[:limit]
    t0 = time.perf_counter()
    outputs = run_test(model, variables, dataset, cfg,
                       batch_size=batch_size)
    dt = time.perf_counter() - t0
    res = dataset.evaluate(outputs, metric=metric, **(eval_kwargs or {}))
    res = {k: v for k, v in res.items() if not isinstance(v, str)}
    res['n_images'] = len(dataset)
    res['img_per_s'] = len(dataset) / dt
    return res


def main():
    args = parse_args()
    import jax.numpy as jnp
    from das_tpu.config import Config
    from das_tpu.apis.inference import init_model

    rungs = {int(r) for r in args.rungs.split(',')}
    report = {'ckpt': args.ckpt, 'rungs': {}}

    cfg = Config.fromfile(args.config)
    model, variables, cfg = init_model(cfg, checkpoint=args.ckpt,
                                       dtype=jnp.bfloat16)

    pan_ok = args.panoptic_root or args.panoptic_ann
    if 1 in rungs:
        if pan_ok:
            ds_cfg = _dataset_cfg(cfg, args.panoptic_ann,
                                  args.panoptic_root)
            report['rungs']['1_single_frame'] = run_rung(
                model, variables, cfg, ds_cfg, 1, 'mpjpe', limit=1)
        else:
            report['rungs']['1_single_frame'] = {
                'skipped': 'no --panoptic-root/--panoptic-ann'}

    if 2 in rungs:
        if args.mupots_root or args.mupots_ann:
            mcfg = Config.fromfile(args.mupots_config)
            # reuse the already-loaded weights (same model tree)
            ds_cfg = _dataset_cfg(mcfg, args.mupots_ann, args.mupots_root)
            ds_cfg['eval_seq'] = 0                       # TS1 only
            if args.flip_test:
                for t in ds_cfg.get('pipeline', []):
                    if t.get('type') == 'MultiScaleFlipAug':
                        t['flip'] = True
            r = run_rung(model, variables, mcfg, ds_cfg, args.batch_size,
                         'pck')
            if args.ref_pck is not None:
                r['delta_pck'] = 100 * r['pck_mean'] - args.ref_pck
            report['rungs']['2_mupots_ts1'] = r
        else:
            report['rungs']['2_mupots_ts1'] = {
                'skipped': 'no --mupots-root/--mupots-ann'}

    if 3 in rungs:
        if pan_ok:
            ds_cfg = _dataset_cfg(cfg, args.panoptic_ann,
                                  args.panoptic_root)
            r = run_rung(model, variables, cfg, ds_cfg, args.batch_size,
                         'mpjpe', eval_kwargs=dict(res_folder='tmp'))
            if args.ref_mpjpe is not None:
                r['delta_mpjpe_mm'] = r['mpjpe_mm'] - args.ref_mpjpe
                r['within_5mm'] = abs(r['delta_mpjpe_mm']) <= 5.0
            report['rungs']['3_panoptic_full'] = r
        else:
            report['rungs']['3_panoptic_full'] = {
                'skipped': 'no --panoptic-root/--panoptic-ann'}

    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps(report, indent=2, default=float))


if __name__ == '__main__':
    main()
