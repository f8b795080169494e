"""Train-step integration: optimizer recipe units + a short overfit run on
the tiny model over the 8-device CPU mesh."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from das_tpu.models import build_model
from das_tpu.parallel.train_step import (TrainState, frozen_mask,
                                         make_lr_fn, make_optimizer,
                                         make_train_step,
                                         mspn_frozen_prefixes, param_groups)

from test_model import TINY_MODEL, J, HW, FEATMAPS, _fake_batch


def test_lr_schedule_matches_mmcv():
    lr_fn = make_lr_fn(2e-3, warmup_iters=250, warmup_ratio=1 / 3,
                       step_epochs=(16, 20), steps_per_epoch=100)
    # warmup start: lr * ratio
    np.testing.assert_allclose(float(lr_fn(jnp.asarray(0))), 2e-3 / 3,
                               rtol=1e-6)
    # warmup midpoint: 1 - (1 - t/W)(1 - ratio)
    t = 125
    expect = 2e-3 * (1 - (1 - t / 250) * (1 - 1 / 3))
    np.testing.assert_allclose(float(lr_fn(jnp.asarray(t))), expect,
                               rtol=1e-6)
    # after warmup, before steps
    np.testing.assert_allclose(float(lr_fn(jnp.asarray(1000))), 2e-3,
                               rtol=1e-6)
    # after first/second milestone
    np.testing.assert_allclose(float(lr_fn(jnp.asarray(1650))), 2e-4,
                               rtol=1e-6)
    np.testing.assert_allclose(float(lr_fn(jnp.asarray(2050))), 2e-5,
                               rtol=1e-6)


def test_param_groups_bias_mults():
    params = {
        'conv': {'kernel': jnp.zeros((3, 3, 4, 4)), 'bias': jnp.zeros(4)},
        'bn': {'scale': jnp.zeros(4), 'bias': jnp.zeros(4)},
    }
    lr_mult, wd_mult = param_groups(params)
    assert lr_mult['conv']['bias'] == 2.0
    assert wd_mult['conv']['bias'] == 0.0
    assert lr_mult['conv']['kernel'] == 1.0
    assert lr_mult['bn']['bias'] == 1.0      # norm biases excluded


def test_frozen_mask_prefixes():
    params = {'backbone': {'top': {'conv': {'kernel': jnp.zeros(1)}},
                           'stage0': {'downsample': {
                               'layer1_0': {'conv1': {'kernel':
                                                      jnp.zeros(1)}},
                               'layer2_0': {'conv1': {'kernel':
                                                      jnp.zeros(1)}}}}}}
    mask = frozen_mask(params, mspn_frozen_prefixes(1))
    assert mask['backbone']['top']['conv']['kernel'] == 0.0
    assert mask['backbone']['stage0']['downsample'][
        'layer1_0']['conv1']['kernel'] == 0.0
    assert mask['backbone']['stage0']['downsample'][
        'layer2_0']['conv1']['kernel'] == 1.0


@pytest.mark.slow
def test_overfit_tiny_model():
    """Loss decreases over a few steps on a fixed synthetic batch."""
    model = build_model(TINY_MODEL)
    img0 = jnp.zeros((2, *HW, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(0), img0))

    lr_fn = make_lr_fn(1e-2, warmup_iters=1, warmup_ratio=1.0,
                       step_epochs=(1000,), steps_per_epoch=1)
    tx_init, tx_update = make_optimizer(
        variables['params'], lr_fn, weight_decay=0.0,
        frozen_prefixes=mspn_frozen_prefixes(1))
    state = TrainState(jnp.zeros((), jnp.int32), variables['params'],
                       variables['batch_stats'],
                       tx_init(variables['params']))
    head = TINY_MODEL['bbox_head']
    step_fn = make_train_step(
        model, tx_update, FEATMAPS, head['strides'],
        head['regress_ranges'], J, max_pos=64, donate=False)

    batch = _fake_batch()
    losses = []
    for _ in range(6):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # frozen subtree must not move
    top0 = variables['params']['backbone']['top']
    top1 = state.params['backbone']['top']
    for a, b in zip(jax.tree.leaves(top0), jax.tree.leaves(top1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_normalize_matches_host_normalize():
    """img_norm in the train step == host-side Normalize (same loss)."""
    model = build_model(TINY_MODEL)
    img0 = jnp.zeros((2, *HW, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(0), img0))
    lr_fn = make_lr_fn(1e-2, warmup_iters=1, warmup_ratio=1.0,
                       step_epochs=(1000,), steps_per_epoch=1)
    tx_init, tx_update = make_optimizer(variables['params'], lr_fn,
                                        weight_decay=0.0)
    head = TINY_MODEL['bbox_head']
    norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)

    def fresh_state():
        return TrainState(jnp.zeros((), jnp.int32), variables['params'],
                          variables['batch_stats'],
                          tx_init(variables['params']))

    batch = _fake_batch()
    raw = np.random.RandomState(3).randint(
        0, 255, (2, *HW, 3)).astype(np.float32)

    mean = np.asarray(norm['mean'], np.float32)
    std = np.asarray(norm['std'], np.float32)
    host_img = (raw[..., ::-1] - mean) / std

    step_host = make_train_step(
        model, tx_update, FEATMAPS, head['strides'],
        head['regress_ranges'], J, max_pos=64, donate=False)
    step_dev = make_train_step(
        model, tx_update, FEATMAPS, head['strides'],
        head['regress_ranges'], J, max_pos=64, donate=False,
        img_norm=norm)

    _, m_host = step_host(fresh_state(),
                          dict(batch, img=jnp.asarray(host_img)))
    _, m_dev = step_dev(fresh_state(), dict(batch, img=jnp.asarray(raw)))
    np.testing.assert_allclose(float(m_dev['loss']),
                               float(m_host['loss']), rtol=1e-5)
