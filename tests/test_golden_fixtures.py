"""Golden regression fixtures: recorded tiny-model head-forward, decode
and train-loss values pinned against silent numeric drift during perf
refactors (the reference's recorded-tensor pattern,
ref tests/test_samples/parta2_roihead_inputs.npz — SURVEY.md §4).

Regenerate deliberately after an *intended* numeric change:
    python tests/test_golden_fixtures.py --regen
Every other diff in these numbers is a bug.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

# match tests/conftest.py: the recorded numbers depend on matmul precision
jax.config.update('jax_default_matmul_precision', 'highest')

sys.path.insert(0, os.path.dirname(__file__))
from test_model import FEATMAPS, HW, J, TINY_MODEL, _fake_batch  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'tiny_model_golden.npz')


def _compute_golden():
    from das_tpu.core.decode import decode_batch
    from das_tpu.core.targets import get_targets
    from das_tpu.models import build_model

    model = build_model(TINY_MODEL)
    img0 = jnp.zeros((2, *HW, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(0), img0))

    rng = np.random.RandomState(123)
    img = jnp.asarray(rng.randn(2, *HW, 3), jnp.float32)

    # eval forward
    cls, pose, ctr, _ = model.apply(variables, img, train=False)
    out = {}
    for i, (c, p, t) in enumerate(zip(cls, pose, ctr)):
        out[f'cls{i}'] = np.asarray(c, np.float32)
        out[f'pose{i}'] = np.asarray(p, np.float32)
        out[f'ctr{i}'] = np.asarray(t, np.float32)

    # fused decode — on synthetic maps, NOT the model outputs: the model
    # outputs carry ~1e-7 run-to-run CPU-threading noise which decode's
    # score ranking amplifies into candidate swaps; synthetic random maps
    # have well-separated scores so the decode fixture is stable
    head = TINY_MODEL['bbox_head']
    dcls = [jnp.asarray(rng.randn(*np.shape(c)) * 2, jnp.float32)
            for c in cls]
    dpose = [jnp.asarray(rng.randn(*np.shape(p)) * 3, jnp.float32)
             for p in pose]
    dctr = [jnp.asarray(rng.randn(*np.shape(c)), jnp.float32)
            for c in ctr]
    decoded = decode_batch(dcls, dpose, dctr, tuple(head['strides']),
                           jnp.ones((2, 2), jnp.float32), J,
                           dict(TINY_MODEL['test_cfg']))
    out['dec_scores'] = np.asarray(decoded['scores'], np.float32)
    out['dec_poses'] = np.asarray(decoded['poses'], np.float32)
    out['dec_valid'] = np.asarray(decoded['valid'])

    # train loss on a fixed batch
    batch = _fake_batch()
    targets = get_targets(
        FEATMAPS, head['strides'], head['regress_ranges'],
        batch['gt_poses_3d'], batch['gt_centers2d'], batch['gt_depths'],
        batch['gt_valid'], J)
    losses, _ = model.apply(variables, batch['img'], targets, 64,
                            method=type(model).loss,
                            mutable=['batch_stats'])
    for k, v in losses.items():
        out[f'loss_{k}'] = np.asarray(v, np.float32)
    return out


def test_golden_fixtures_unchanged():
    assert os.path.exists(FIXTURE), \
        'fixture missing — run: python tests/test_golden_fixtures.py --regen'
    want = dict(np.load(FIXTURE))
    got = _compute_golden()
    assert set(got) == set(want), (set(got) ^ set(want))
    for k in sorted(want):
        if k.startswith(('cls', 'pose', 'ctr')):
            # conv towers: XLA-CPU (oneDNN) results vary ~1e-3 across
            # processes with threading; still catches real refactor drift
            rtol, atol = 1e-2, 5e-3
        else:
            # decode (synthetic maps) and losses are elementwise-dominated
            # and reproducible
            rtol, atol = 5e-4, 5e-5
        np.testing.assert_allclose(
            got[k], want[k], rtol=rtol, atol=atol,
            err_msg=f'golden fixture drifted: {k}')


if __name__ == '__main__':
    if '--regen' in sys.argv:
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, **_compute_golden())
        print(f'wrote {FIXTURE}')
    else:
        print(__doc__)
