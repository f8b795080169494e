"""End-to-end slice: synthetic Panoptic data -> test pipeline -> fused
predict -> evaluator. Proves the full inference path (BASELINE config #1
shape) wires together without real data."""

import json
import os

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from das_tpu.config import Config
from das_tpu.apis.test import run_test
from das_tpu.datasets import build_dataset
from das_tpu.models import build_model

import copy

from test_model import TINY_MODEL

# the Panoptic evaluator is 15-joint; clone the tiny model at J=15
J = 15
TINY15 = copy.deepcopy(TINY_MODEL)
TINY15['bbox_head']['num_joints'] = J
TINY15['bbox_head']['recursive_update']['num_joints'] = J
TINY15['train_cfg'] = dict(code_weight=[1.0, 1.0, 1] + [2] * J * 6)

IMG_H, IMG_W = 120, 160
F = 200.0


def make_dataset_on_disk(tmpdir, n_images=2):
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        fname = f'img_{i}.jpg'
        cv2.imwrite(os.path.join(tmpdir, fname),
                    rng.randint(0, 255, (IMG_H, IMG_W, 3)).astype(np.uint8))
        images.append(dict(
            id=i + 1, file_name=fname, width=IMG_W, height=IMG_H,
            cam=dict(K=[[F, 0, IMG_W / 2], [0, F, IMG_H / 2], [0, 0, 1]],
                     R=np.eye(3).tolist(), t=[[0.], [0.], [0.]])))
        base = np.array([60 + 30 * i, 60, 400.0])
        joints = base + rng.randn(J, 3) * [15, 20, 5]
        u, v, z = joints[:, 0], joints[:, 1], joints[:, 2]
        world = np.stack([(u - IMG_W / 2) / F * z,
                          (v - IMG_H / 2) / F * z, z], axis=1)
        bbox = [float(u.min()), float(v.min()),
                float(u.max() - u.min() + 4), float(v.max() - v.min() + 4)]
        annotations.append(dict(
            id=aid, image_id=i + 1, category_id=1, bbox=bbox,
            area=bbox[2] * bbox[3], iscrowd=0,
            joints3d_img=joints.tolist(), joints3d=world.tolist(),
            joints2d_vis=[[1, 1]] * J, joints3d_vis=[[1, 1, 1]] * J))
        aid += 1
    ann_path = os.path.join(tmpdir, 'ann.json')
    with open(ann_path, 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name='person')]), f)
    return ann_path


def test_full_inference_to_evaluation(tmp_path):
    tmpdir = str(tmp_path)
    ann_path = make_dataset_on_disk(tmpdir)

    img_norm = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
    test_pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotationsPose3D', with_pose_3d=True,
             with_label_3d=False),
        dict(type='MultiScaleFlipAug', img_scale=(160, 128), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='Normalize', **img_norm),
                 dict(type='Pad', size_divisor=32),
                 dict(type='Collect3D', keys=['img', 'gt_poses_3d',
                                              'depths']),
             ])
    ]
    cfg = Config(dict(
        model=TINY15,
        data=dict(test=dict(
            type='CMUPanopticDataset', ann_file=ann_path,
            img_prefix=tmpdir, pipeline=test_pipeline, test_mode=True,
            norm_depth=True, abs_dz=True, depth_factor=1))))

    model = build_model(dict(cfg.model))
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    import jax
    variables = dict(model.init_all(jax.random.PRNGKey(0), img0))

    dataset = build_dataset(cfg.data['test'])
    outputs = run_test(model, variables, dataset, cfg, batch_size=2,
                       progress=False)
    assert len(outputs) == len(dataset)
    for out in outputs:
        assert out['poses'].ndim == 3 and out['poses'].shape[1:] == (J, 3)
        assert len(out['scores']) == len(out['poses'])

    # evaluator runs end-to-end on (random-weight) predictions
    res = dataset.evaluate(outputs, metric='mpjpe')
    assert 'mpjpe_mm' in res and np.isfinite(res['mpjpe_mm'])
