"""Target-assignment unit tests against hand-computed values
(semantics of das_head.py:551-651)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from das_tpu.core.targets import get_targets, make_points

J = 2
STRIDES = (8, 16)
SHAPES = [(4, 4), (2, 2)]
RR = ((-1, 80), (80, 1e8))


def _single_gt(center=(20.0, 12.0), depth=2.0, offsets=((5, 0, 0.1),
                                                        (0, 5, -0.1))):
    poses = np.zeros((1, 1, 3 + 4 * J), np.float32)
    poses[0, 0, :2] = center
    poses[0, 0, 2] = depth
    for j, (dx, dy, dz) in enumerate(offsets):
        poses[0, 0, 3 + j * 3] = center[0] + dx
        poses[0, 0, 3 + j * 3 + 1] = center[1] + dy
        poses[0, 0, 3 + j * 3 + 2] = dz
    poses[0, 0, 3 + 3 * J:] = 1
    return dict(
        gt_poses_3d=jnp.asarray(poses),
        gt_centers2d=jnp.asarray(poses[..., :2].copy()),
        gt_depths=jnp.asarray(poses[..., 2].copy()),
        gt_valid=jnp.ones((1, 1), bool))


def test_center_sampling_and_level_gating():
    gt = _single_gt()
    t = get_targets(SHAPES, STRIDES, RR, **gt, num_joints=J)
    labels = np.asarray(t['labels'])
    pts, strd, lvl = make_points(SHAPES, STRIDES)
    # max joint-offset length = 5 < 80 -> only level 0 can be positive
    lvl0 = labels[:16]
    lvl1 = labels[16:]
    assert (lvl1 == 1).all()
    # positives: points within radius*stride=12 of center (20,12), strictly
    pos_idx = np.where(lvl0 == 0)[0]
    assert len(pos_idx) > 0
    for i in pos_idx:
        x, y = pts[i]
        assert abs(x - 20) < 12 and abs(y - 12) < 12

    # check the matched pose target on one positive point
    pose_t = np.asarray(t['pose_targets'])
    i = pos_idx[0]
    x, y = pts[i]
    # dx,dy normalised by stride (ref get_targets :547)
    np.testing.assert_allclose(pose_t[i, 0], (x - 20) / 8, rtol=1e-5)
    np.testing.assert_allclose(pose_t[i, 1], (y - 12) / 8, rtol=1e-5)
    np.testing.assert_allclose(pose_t[i, 2], 2.0, rtol=1e-5)
    # duvd: joint0 = root + (5,0), z kept absolute (0.1)
    np.testing.assert_allclose(pose_t[i, 3:6], [5, 0, 0.1], atol=1e-5)
    # visibility appended
    np.testing.assert_allclose(pose_t[i, 3 + 3 * J:], [1, 1])

    # centerness = exp(-2.5 * d / (1.414 * stride * radius))
    d = np.sqrt((x - 20) ** 2 + (y - 12) ** 2)
    expect = np.exp(-2.5 * d / (1.414 * 8 * 1.5))
    np.testing.assert_allclose(np.asarray(t['centerness_targets'])[i],
                               expect, rtol=1e-4)


def test_nearest_root_wins_ambiguity():
    # two GTs close together: points assign to the nearer root
    poses = np.zeros((1, 2, 3 + 4 * J), np.float32)
    for g, cx in enumerate([16.0, 24.0]):
        poses[0, g, :2] = (cx, 12)
        poses[0, g, 2] = 1.0
        for j in range(J):
            poses[0, g, 3 + j * 3] = cx + 3
            poses[0, g, 3 + j * 3 + 1] = 12
        poses[0, g, 3 + 3 * J:] = 1
    gt = dict(
        gt_poses_3d=jnp.asarray(poses),
        gt_centers2d=jnp.asarray(poses[..., :2].copy()),
        gt_depths=jnp.asarray(poses[..., 2].copy()),
        gt_valid=jnp.ones((1, 2), bool))
    t = get_targets(SHAPES, STRIDES, RR, **gt, num_joints=J)
    pose_t = np.asarray(t['pose_targets'])
    labels = np.asarray(t['labels'])
    pts, _, _ = make_points(SHAPES, STRIDES)
    for i in np.where(labels[:16] == 0)[0]:
        x = pts[i][0]
        # depth reveals which gt was matched: both have depth 1.0 but
        # dx * stride + center must reconstruct the matched root
        dx = pose_t[i, 0] * 8
        matched_cx = x - dx
        d0 = abs(x - 16)
        d1 = abs(x - 24)
        # ties resolve to the first gt (torch/np argmin semantics,
        # ref das_head.py:636)
        expect_cx = 16.0 if d0 <= d1 else 24.0
        np.testing.assert_allclose(matched_cx, expect_cx, atol=1e-4)


def test_invalid_gt_masked():
    gt = _single_gt()
    gt['gt_valid'] = jnp.zeros((1, 1), bool)
    t = get_targets(SHAPES, STRIDES, RR, **gt, num_joints=J)
    assert (np.asarray(t['labels']) == 1).all()
