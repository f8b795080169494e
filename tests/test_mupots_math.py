"""MuPoTS evaluator math sanity (procrustes, bone-length norm, matching,
PCK aggregation — semantics of mupots_3dhp.py:436-566)."""

import numpy as np

from das_tpu.datasets.mupots import (PARENTS_O1, SAFE_TRAVERSAL,
                                     compute_pck, match_poses,
                                     norm_by_bone_length, procrustes)

RNG = np.random.RandomState(9)


def _pose17():
    """Random but skeleton-consistent 17-joint pose, (3, 17), mm scale."""
    p = RNG.randn(3, 17) * 200
    p[2] += 3000
    return p


def test_procrustes_recovers_rotation():
    gt = _pose17()
    theta = 0.4
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]])
    pred = R @ gt
    aligned = procrustes(pred, gt)
    np.testing.assert_allclose(aligned, gt, atol=1e-6)


def test_bone_length_norm_matches_gt_lengths():
    gt = _pose17()
    pred = gt * 1.7 + RNG.randn(3, 17) * 5
    out = norm_by_bone_length(pred - pred[:, 14:15], gt - gt[:, 14:15],
                              PARENTS_O1, SAFE_TRAVERSAL[1:])
    for idx in SAFE_TRAVERSAL[1:]:
        gt_len = np.linalg.norm(gt[:, idx] - gt[:, PARENTS_O1[idx]])
        out_len = np.linalg.norm(out[:, idx] - out[:, PARENTS_O1[idx]])
        np.testing.assert_allclose(out_len, gt_len, rtol=1e-5)


def test_match_identical_poses():
    gts = [_pose17(), _pose17() + 500]
    preds = np.stack([gts[1], gts[0]])   # swapped order
    matches, matches_abs = match_poses(gts, preds)
    assert matches == [1, 0]


def test_match_threshold_rejects():
    # matching is bone-normalised and root-relative, so only the threshold
    # mechanism is tested: a noisy prediction must fail a tiny threshold
    gts = [_pose17()]
    preds = np.stack([gts[0] + RNG.randn(3, 17) * 50])
    matches, _ = match_poses(gts, preds, threshold=1.0)
    assert matches == [-1]


def test_compute_pck_bounds():
    perfect = [[np.zeros(17)] * 5]
    hopeless = [[np.full(17, 1e5)] * 5]
    assert compute_pck(perfect) == [1.0]
    assert compute_pck(hopeless) == [0.0]
