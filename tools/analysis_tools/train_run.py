"""Sustained on-chip training artifact (multi-hundred-step run).

Drives the REAL ``das_tpu.apis.train.train_model`` loop — loader worker
pool, device_normalize, SPMD step, LR schedule, checkpoint cadence,
metric logging — for N steps of the exp_panoptic recipe on a synthetic
on-disk Panoptic-style dataset at the real train resolution
(B=4 512x960 bf16), then writes one JSON artifact with the loss curve,
the per-step time series, and the checkpoint cadence.

This is the EpochBasedRunner-equivalence proof the 1-step dryruns and
the few-step overfit test don't give (ref mmcv EpochBasedRunner /
/root/reference/configs/das/exp_panoptic.py:206-212 — a 22-epoch
recipe): the rebuilt loop must survive hundreds of steps on the chip
with a stable step time and a decreasing loss.

Run:  python tools/analysis_tools/train_run.py --steps 300 \
          [--out TRAIN_RUN_r05.json]
"""

import argparse
import glob
import json
import os
import sys
import time

here = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..')
sys.path.insert(0, here)

IMG_H, IMG_W = 512, 960


def make_dataset(tmpdir, n_images, n_people=3, seed=0):
    """Panoptic-style COCO json + real jpgs at the train resolution."""
    import cv2
    import numpy as np
    rng = np.random.RandomState(seed)
    J = 15
    images, annotations = [], []
    aid = 1
    os.makedirs(tmpdir, exist_ok=True)
    base_img = rng.randint(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8)
    for i in range(n_images):
        fname = f'synth_{i:04d}.jpg'
        # cheap structured variety: roll the base image instead of fresh
        # randint (keeps generation fast; the model still sees distinct
        # pixels per image)
        img = np.roll(base_img, (i * 13) % IMG_H, axis=0)
        cv2.imwrite(os.path.join(tmpdir, fname), img)
        images.append(dict(
            id=i + 1, file_name=fname, width=IMG_W, height=IMG_H,
            cam=dict(K=[[1000., 0, IMG_W / 2], [0, 1000., IMG_H / 2],
                        [0, 0, 1]],
                     R=np.eye(3).tolist(), t=[[0.], [0.], [0.]])))
        for p in range(n_people):
            base = np.array([rng.uniform(120, IMG_W - 120),
                             rng.uniform(100, IMG_H - 100),
                             rng.uniform(200, 400)])
            joints = base + rng.randn(J, 3) * [30, 45, 12]
            u, v = joints[:, 0], joints[:, 1]
            bbox = [float(u.min()), float(v.min()),
                    float(u.max() - u.min() + 4),
                    float(v.max() - v.min() + 4)]
            annotations.append(dict(
                id=aid, image_id=i + 1, category_id=1, bbox=bbox,
                area=bbox[2] * bbox[3], iscrowd=0,
                joints3d_img=joints.tolist(),
                joints3d=joints.tolist(),
                joints2d_vis=[[1, 1]] * J, joints3d_vis=[[1, 1, 1]] * J))
            aid += 1
    path = os.path.join(tmpdir, 'train.json')
    with open(path, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name='person')]), f)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=300)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--images', type=int, default=160)
    ap.add_argument('--workers', type=int, default=8)
    ap.add_argument('--data-dir', default='/tmp/das_tpu_train_run_data')
    ap.add_argument('--work-dir', default='/tmp/das_tpu_train_run')
    ap.add_argument('--out', default='TRAIN_RUN_r05.json')
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from das_tpu.utils.cache import jax_cache_dir
    jax.config.update('jax_compilation_cache_dir', jax_cache_dir())

    from das_tpu.config import Config
    from das_tpu.apis.train import train_model

    ann = os.path.join(args.data_dir, 'train.json')
    if not os.path.exists(ann):
        print(f'generating {args.images} synthetic {IMG_H}x{IMG_W} images')
        ann = make_dataset(args.data_dir, args.images)

    cfg = Config.fromfile('configs/das/exp_panoptic.py')
    # real recipe; only the data sources and the multiscale jitter are
    # replaced (fixed 512x960 so the jitted step has ONE shape)
    pipeline = []
    for t in cfg.data['train'][0]['pipeline']:
        t = dict(t)
        if t['type'] == 'ResizePose':
            t['img_scale'] = (IMG_W, IMG_H)
        pipeline.append(t)
    cfg['data'] = dict(
        samples_per_gpu=args.batch,
        workers_per_gpu=args.workers,
        device_normalize=True,
        train=dict(type='CMUPanopticDataset', ann_file=ann,
                   img_prefix=args.data_dir, pipeline=pipeline,
                   norm_depth=True, abs_dz=True, depth_factor=1))
    cfg['model'] = dict(cfg.model, pretrained=None)
    cfg['log_config'] = dict(interval=1)   # per-step series

    t0 = time.time()
    state = train_model(cfg, work_dir=args.work_dir,
                        max_steps=args.steps, log_interval=1,
                        dtype=jnp.bfloat16)
    wall = time.time() - t0
    assert int(jax.device_get(state.step)) == args.steps

    # ---- artifact from the run's own jsonl metrics stream
    streams = sorted(glob.glob(os.path.join(args.work_dir,
                                            '*.metrics.jsonl')))
    rows = [json.loads(ln) for ln in open(streams[-1])]
    rows = [r for r in rows if 'loss' in r][:args.steps]
    losses = [r['loss'] for r in rows]
    ips = [r['img_per_s'] for r in rows]
    # steady-state step time: drop the first 3 (compile + warmup)
    steady = sorted(args.batch / np.maximum(np.asarray(ips[3:]), 1e-9))
    k = len(steady)
    ckpts = sorted(os.listdir(os.path.join(args.work_dir, 'ckpts')))
    n5 = max(1, len(losses) // 20)
    artifact = dict(
        steps=len(rows), batch=args.batch, hw=[IMG_H, IMG_W],
        wall_s=round(wall, 1),
        loss_first10=round(float(np.mean(losses[:10])), 4),
        loss_last10=round(float(np.mean(losses[-10:])), 4),
        loss_curve=[round(float(np.mean(losses[i:i + n5])), 3)
                    for i in range(0, len(losses), n5)],
        step_s_min=round(steady[0], 3),
        step_s_p50=round(steady[k // 2], 3),
        step_s_p90=round(steady[int(k * 0.9)], 3),
        grad_norm_last=round(rows[-1].get('grad_norm', float('nan')), 2),
        checkpoints=ckpts,
        finite=all(np.isfinite(losses)),
        decreasing=bool(np.mean(losses[-10:]) < np.mean(losses[:10])))
    with open(args.out, 'w') as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == '__main__':
    main()
