"""device_preprocess=True run_test path vs the host pipeline: identical
decoded people (fused on-device resize/normalize/pad/flip,
SURVEY §2.3 north-star preprocessing)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from das_tpu.config import Config
from das_tpu.models import build_model
from das_tpu.datasets import build_dataset
from das_tpu.apis.test import run_test

from test_e2e import TINY15, make_dataset_on_disk

PAIRS = [[3, 9], [4, 10], [5, 11], [6, 12], [7, 13], [8, 14]]


def test_device_preprocess_matches_host_pipeline(tmp_path):
    tmpdir = str(tmp_path)
    ann = make_dataset_on_disk(tmpdir, n_images=2)
    img_norm = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug',
             img_scale=(160, 120), flip=True, flip_pairs=PAIRS,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='Normalize', **img_norm),
                 dict(type='Pad', size_divisor=32),
                 dict(type='Collect3D', keys=['img']),
             ])
    ]
    model_cfg = dict(TINY15)
    model_cfg['test_cfg'] = dict(nms_pre=50, nms_post=8, nms_thr=0.9,
                                 score_thr=0.0003)
    cfg = Config(dict(model=model_cfg, data=dict(test=dict(
        type='CMUPanopticDataset', ann_file=ann, img_prefix=tmpdir,
        pipeline=pipeline, test_mode=True, norm_depth=True, abs_dz=True,
        depth_factor=1))))

    model = build_model(dict(cfg.model))
    variables = dict(model.init_all(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)))
    dataset = build_dataset(cfg.data['test'])

    host = run_test(model, variables, dataset, cfg, batch_size=2,
                    progress=False)
    dev = run_test(model, variables, dataset, cfg, batch_size=2,
                   progress=False, device_preprocess=True)
    for h, d in zip(host, dev):
        assert len(h['poses']) == len(d['poses'])
        if len(h['poses']):
            np.testing.assert_allclose(d['poses'], h['poses'], atol=1.5)
            np.testing.assert_allclose(d['scores'], h['scores'],
                                       atol=0.02)
