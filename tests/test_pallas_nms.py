"""Pallas OKS-NMS kernel vs the XLA/numpy references (interpret mode on
the CPU test backend)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from das_tpu.ops.oks_nms import default_sigmas, oks_nms_np
from das_tpu.ops.pallas_nms import oks_nms_pallas

RNG = np.random.RandomState(11)


def test_pallas_nms_matches_numpy():
    M, J = 48, 15
    kpts = RNG.rand(M, J, 2).astype(np.float32) * 60
    kpts[1::3] = kpts[0::3][:len(kpts[1::3])] + \
        RNG.randn(*kpts[1::3].shape).astype(np.float32)
    scores = np.sort(RNG.rand(M).astype(np.float32))[::-1].copy()
    areas = (kpts[..., 0].max(1) - kpts[..., 0].min(1)) * \
            (kpts[..., 1].max(1) - kpts[..., 1].min(1))
    sig = default_sigmas(J)

    db = [dict(score=scores[i],
               keypoints=np.concatenate(
                   [kpts[i], np.ones((J, 1), np.float32)], -1),
               area=areas[i]) for i in range(M)]
    ref_keep = np.zeros(M, bool)
    ref_keep[oks_nms_np(db, thr=0.9)] = True

    keep = oks_nms_pallas(jnp.asarray(kpts), jnp.asarray(areas),
                          jnp.ones(M, bool), 0.9, sig, interpret=True)
    np.testing.assert_array_equal(np.asarray(keep), ref_keep)


def test_pallas_nms_respects_valid_mask():
    M, J = 16, 4
    kpts = RNG.rand(M, J, 2).astype(np.float32) * 50
    areas = np.full(M, 100.0, np.float32)
    valid = np.zeros(M, bool)
    valid[:5] = True
    keep = oks_nms_pallas(jnp.asarray(kpts), jnp.asarray(areas),
                          jnp.asarray(valid), 0.9, default_sigmas(J),
                          interpret=True)
    assert not np.asarray(keep)[5:].any()
