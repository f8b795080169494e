"""MuPoTS eval compile-budget check (exp_mupots device-preprocess path).

``apis/test._device_pre_sweep`` compiles 1-2 XLA programs (direct +
flip) per ORIGINAL-resolution bucket. MuPoTS-3D's 20 test sequences come
in two camera classes — TS1-TS5 at 2048x2048 and TS6-TS20 at 1920x1080
(MuPoTS-3D release; the reference reads whatever ``images[].height/
width`` the converted annotations carry, mupots_3dhp.py uses them only
for bbox clipping) — so rung #2's real eval compiles at most
2 buckets x 2 programs. This tool measures that cost for real: it
synthesizes a tiny dataset with the given buckets, runs the actual
``run_test(device_preprocess=True)`` path on the chip, and reports the
per-bucket compile wall time and program count.

Run:  python tools/analysis_tools/mupots_bucket_check.py
      [--buckets 2048x2048,1080x1920] [--per-bucket 2]
"""

import argparse
import json
import os
import sys
import time

here = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')
sys.path.insert(0, here)


def make_mupots_like(tmpdir, buckets, per_bucket):
    import cv2
    import numpy as np
    rng = np.random.RandomState(0)
    J = 17
    images, annotations = [], []
    aid, iid = 1, 1
    for b, (h, w) in enumerate(buckets):
        seq = f'TS{b + 1}'
        os.makedirs(os.path.join(tmpdir, seq), exist_ok=True)
        img0 = rng.randint(0, 255, (h, w, 3)).astype('uint8')
        for i in range(per_bucket):
            fname = f'{seq}/img_{i:06d}.jpg'
            cv2.imwrite(os.path.join(tmpdir, fname), img0,
                        [cv2.IMWRITE_JPEG_QUALITY, 30])
            images.append(dict(id=iid, file_name=fname, width=w, height=h))
            base = np.array([w / 2, h / 2, 300.0])
            joints = base + rng.randn(J, 3) * [60, 90, 10]
            u, v = joints[:, 0], joints[:, 1]
            bbox = [float(u.min()), float(v.min()),
                    float(np.ptp(u) + 4), float(np.ptp(v) + 4)]
            annotations.append(dict(
                id=aid, image_id=iid, category_id=1, bbox=bbox,
                area=bbox[2] * bbox[3], iscrowd=0, is_valid=1,
                joints3d_img=joints.tolist(), joints3d=joints.tolist(),
                joints2d_vis=[[1, 1]] * J, joints3d_vis=[[1, 1, 1]] * J))
            aid += 1
            iid += 1
    path = os.path.join(tmpdir, 'MuPoTS-3D.json')
    with open(path, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name='person')]), f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--buckets', default='2048x2048,1080x1920',
                    help='comma-separated HxW original-resolution buckets')
    ap.add_argument('--per-bucket', type=int, default=2)
    ap.add_argument('--batch-size', type=int, default=2)
    ap.add_argument('--data-dir', default='/tmp/das_tpu_mupots_buckets')
    args = ap.parse_args()

    buckets = [tuple(int(v) for v in b.split('x'))
               for b in args.buckets.split(',')]

    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.apis.inference import init_model
    from das_tpu.apis.test import run_test
    from das_tpu.datasets import build_dataset
    from das_tpu.datasets.pipelines import _rescale_size

    ann = make_mupots_like(args.data_dir, buckets, args.per_bucket)

    cfg = Config.fromfile('configs/das/exp_mupots.py')
    model, variables, cfg = init_model(cfg, dtype=jnp.bfloat16)
    d = dict(cfg.data['test'])
    d.update(ann_file=ann, data_root=args.data_dir, img_prefix=None)
    dataset = build_dataset(d)
    cfg.data = dict(cfg.data, test=d, device_preprocess=True)

    pipe = d['pipeline']
    msfa = next(t for t in pipe if t.get('type') == 'MultiScaleFlipAug')
    scale = tuple(msfa['img_scale'])
    do_flip = bool(msfa.get('flip', False))
    report = []
    t_all = time.perf_counter()
    # per-bucket cost: run each bucket alone (fresh jit cache per shape)
    for (h, w) in buckets:
        sub = [i for i, inf in enumerate(dataset.data_infos)
               if (int(inf['height']), int(inf['width'])) == (h, w)]
        keep_ids = [dataset.img_ids[i] for i in sub]
        dsb = build_dataset(d)
        dsb.img_ids = keep_ids
        dsb.data_infos = [dsb.data_infos[i] for i in sub]
        t0 = time.perf_counter()
        run_test(model, variables, dsb, cfg, batch_size=args.batch_size,
                 progress=False)
        dt = time.perf_counter() - t0
        new_h, new_w = _rescale_size(h, w, scale)
        report.append(dict(
            bucket=[h, w],
            model_hw=[-(-new_h // 32) * 32, -(-new_w // 32) * 32],
            programs=2 if do_flip else 1,
            compile_plus_run_s=round(dt, 1)))
    print(json.dumps(dict(
        buckets=report,
        total_programs=sum(r['programs'] for r in report),
        total_wall_s=round(time.perf_counter() - t_all, 1),
        flip_test=do_flip)))


if __name__ == '__main__':
    main()
