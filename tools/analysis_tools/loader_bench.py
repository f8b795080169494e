"""Input-pipeline throughput: measure the train loader host-side
(images/sec through the full augmentation pipeline), independent of the
TPU. Run with --workers to compare thread counts.

The DAS recipe needs the loader to outpace the device step
(BASELINE rung #5); this prints the margin.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def make_dataset(tmpdir, n_images, hw=(1080, 1920)):
    import cv2
    import numpy as np
    rng = np.random.RandomState(0)
    J = 15
    images, annotations = [], []
    aid = 1
    img0 = rng.randint(0, 255, (*hw, 3)).astype('uint8')
    cv2.imwrite(os.path.join(tmpdir, 'img.jpg'), img0)
    for i in range(n_images):
        images.append(dict(
            id=i + 1, file_name='img.jpg', width=hw[1], height=hw[0],
            cam=dict(K=[[1400., 0, 960.], [0, 1400., 540.], [0, 0, 1]],
                     R=np.eye(3).tolist(), t=[[0.], [0.], [0.]])))
        for p in range(3):
            base = np.array([500 + 300 * p, 500, 300.0])
            joints = base + rng.randn(J, 3) * [80, 120, 10]
            u, v = joints[:, 0], joints[:, 1]
            bbox = [float(u.min()), float(v.min()),
                    float(np.ptp(u) + 4), float(np.ptp(v) + 4)]
            annotations.append(dict(
                id=aid, image_id=i + 1, category_id=1, bbox=bbox,
                area=bbox[2] * bbox[3], iscrowd=0,
                joints3d_img=joints.tolist(), joints3d=joints.tolist(),
                joints2d_vis=[[1, 1]] * J, joints3d_vis=[[1, 1, 1]] * J))
            aid += 1
    path = os.path.join(tmpdir, 'ann.json')
    with open(path, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name='person')]), f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workers', type=int, default=8)
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--steps', type=int, default=12)
    ap.add_argument('--images', type=int, default=64)
    ap.add_argument('--worker-type', default='thread',
                    choices=('thread', 'process'))
    args = ap.parse_args()

    from das_tpu.config import Config
    from das_tpu.datasets import build_dataset
    from das_tpu.datasets.loader import TrainLoader

    cfg = Config.fromfile('configs/das/exp_panoptic.py')
    train_cfg = (cfg.data['train'][0] if isinstance(cfg.data['train'],
                                                    (list, tuple))
                 else cfg.data['train'])

    tmpdir = tempfile.mkdtemp()
    ann = make_dataset(tmpdir, args.images)
    ds_cfg = dict(train_cfg)
    ds_cfg.update(ann_file=ann, img_prefix=tmpdir, data_root=None)
    dataset = build_dataset(ds_cfg)

    loader = TrainLoader(dataset, args.batch, (800, 1344), 15,
                         num_workers=args.workers,
                         worker_type=args.worker_type,
                         dataset_cfg=ds_cfg)
    it = iter(loader)
    next(it)                                     # warm the pool
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.steps):
        batch = next(it)
        n += batch['img'].shape[0]
    dt = time.perf_counter() - t0
    print(json.dumps(dict(workers=args.workers, batch=args.batch,
                          worker_type=args.worker_type,
                          img_per_s=round(n / dt, 2),
                          ms_per_batch=round(dt / args.steps * 1e3, 1))))


if __name__ == '__main__':
    main()
