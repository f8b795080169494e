"""Orbax save/restore roundtrip (CheckpointHook equivalent)."""

import numpy as np

import jax.numpy as jnp

from das_tpu.checkpoint.orbax_io import CheckpointManager
from das_tpu.parallel.train_step import TrainState


def _state(seed):
    rng = np.random.RandomState(seed)
    return TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={'conv': {'kernel': jnp.asarray(rng.randn(3, 3, 2, 2),
                                               jnp.float32)}},
        batch_stats={'bn': {'mean': jnp.asarray(rng.randn(2), jnp.float32)}},
        opt_state=dict(momentum={'conv': {'kernel': jnp.zeros((3, 3, 2, 2))}},
                       count=jnp.asarray(7, jnp.int32)))


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / 'ckpts'), max_keep=3)
    state = _state(0)
    mgr.save(state, 7)
    assert mgr.latest_step() == 7

    target = _state(1)          # different values, same structure
    restored = mgr.restore(target, 'latest')
    np.testing.assert_array_equal(
        np.asarray(restored.params['conv']['kernel']),
        np.asarray(state.params['conv']['kernel']))
    assert int(restored.step) == 7


def test_max_keep_evicts(tmp_path):
    mgr = CheckpointManager(str(tmp_path / 'ckpts'), max_keep=2)
    for step in (1, 2, 3):
        s = _state(step)._replace(step=jnp.asarray(step, jnp.int32))
        mgr.save(s, step)
    steps = mgr.manager.all_steps()
    assert 1 not in steps and set(steps) == {2, 3}
