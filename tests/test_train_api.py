"""train_model end-to-end smoke: synthetic dataset on disk -> loader ->
SPMD train step -> orbax checkpoint -> resume."""

import json
import os

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from das_tpu.config import Config
from das_tpu.apis.train import train_model

from test_e2e import TINY15
J = 15

IMG_H, IMG_W = 80, 100


def make_train_dataset(tmpdir, n_images=8):
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        fname = f't_{i}.jpg'
        cv2.imwrite(os.path.join(tmpdir, fname),
                    rng.randint(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8))
        images.append(dict(
            id=i + 1, file_name=fname, width=IMG_W, height=IMG_H,
            cam=dict(K=[[150., 0, 50.], [0, 150., 40.], [0, 0, 1]],
                     R=np.eye(3).tolist(), t=[[0.], [0.], [0.]])))
        for p in range(2):
            base = np.array([30 + 35 * p, 40, 300.0])
            joints = base + rng.randn(J, 3) * [8, 10, 4]
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


@pytest.mark.slow
def test_train_model_api(tmp_path):
    tmpdir = str(tmp_path)
    ann = make_train_dataset(tmpdir)
    img_norm = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
    train_pipeline = [
        dict(type='LoadImageFromFile', to_float32=True),
        dict(type='LoadAnnotationsPose3D', with_bbox=True, with_label=True),
        dict(type='ResizePose', scale_depth=True, abs_dz=True,
             img_scale=(100, 80), multiscale_mode='range', keep_ratio=True),
        dict(type='Normalize', **img_norm),
        dict(type='Pad', size_divisor=32),
        dict(type='Collect3D',
             keys=['img', 'gt_bboxes', 'gt_labels', 'gt_poses_3d',
                   'gt_labels_3d', 'centers2d', 'depths'],
             num_joints=J),
    ]
    cfg = Config(dict(
        model=TINY15,
        data=dict(samples_per_gpu=1, workers_per_gpu=2,
                  train=dict(type='CMUPanopticDataset', ann_file=ann,
                             img_prefix=tmpdir, pipeline=train_pipeline,
                             norm_depth=True, abs_dz=True, depth_factor=1)),
        optimizer=dict(lr=1e-3, momentum=0.9, weight_decay=1e-4,
                       paramwise_cfg=dict(bias_lr_mult=2.,
                                          bias_decay_mult=0.)),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(warmup_iters=2, warmup_ratio=1 / 3, step=[100]),
        runner=dict(max_epochs=1),
        log_config=dict(interval=1),
        checkpoint_config=dict(max_keep_ckpts=2),
    ))
    work_dir = os.path.join(tmpdir, 'work')
    state = train_model(cfg, work_dir=work_dir, max_steps=2,
                        dtype=jnp.float32)
    assert int(state.step) == 2
    ckpts = os.listdir(os.path.join(work_dir, 'ckpts'))
    assert len(ckpts) >= 1

    # resume continues from the saved step
    state2 = train_model(cfg, work_dir=work_dir, resume_from='latest',
                         max_steps=3, dtype=jnp.float32)
    assert int(state2.step) == 3
