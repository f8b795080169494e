"""MuPoTS evaluator math vs direct transcriptions of the reference loops
(ref mmdet3d/datasets/mupots_3dhp.py:436-566).

The bone-length normalisation and the PCK aggregation are validated
against line-by-line numpy transcriptions of the reference code on random
poses — NOT against the repo's own functions — so a semantic divergence
(like the round-1 parent-pairing bug) fails here.
"""

import numpy as np

from das_tpu.datasets.mupots import (ALL_GROUP_JOINTS, JOINT_GROUPS,
                                     PARENTS_O1, SAFE_TRAVERSAL,
                                     compute_pck, match_poses,
                                     mpii_compute_3d_pck,
                                     norm_by_bone_length, procrustes)

RNG = np.random.RandomState(9)


def _pose17():
    """Random but skeleton-consistent 17-joint pose, (3, 17), mm scale."""
    p = RNG.randn(3, 17) * 200
    p[2] += 3000
    return p


# --- direct transcriptions of the reference (mupots_3dhp.py) ------------

def _ref_norm_by_bone_length(pred, gt, o1, trav):
    """Transcription of ref mupots_3dhp.py:480-489 (loop-position o1)."""
    mapped_pose = pred.copy()
    for i in range(len(trav)):
        idx = trav[i]
        gt_len = np.linalg.norm(gt[:, idx] - gt[:, o1[i]])
        pred_vec = pred[:, idx] - pred[:, o1[i]]
        pred_len = np.linalg.norm(pred_vec)
        mapped_pose[:, idx] = (mapped_pose[:, o1[i]]
                               + pred_vec * gt_len / pred_len)
    return mapped_pose


def _ref_mpii_compute_3d_pck(seq_err):
    """Transcription of ref mupots_3dhp.py:436-473."""
    pck_curve_array, pck_array, auc_array = [], [], []
    thresh = np.arange(0, 200, 5)
    pck_thresh = 150
    joint_groups = [g for _, g in JOINT_GROUPS]
    all_joints = ALL_GROUP_JOINTS
    for seq_idx in range(len(seq_err)):
        pck_curve, pck_seq, auc_seq = [], [], []
        err = np.array(seq_err[seq_idx]).astype(np.float32)
        for j in range(len(joint_groups)):
            err_selected = err[:, joint_groups[j]]
            buff = []
            for t in thresh:
                pck = np.float32(err_selected < t).sum() / \
                    len(joint_groups[j]) / len(err)
                buff.append(pck)
            pck_curve.append(buff)
            auc_seq.append(sum(buff) / len(buff))
            pck = np.float32(err_selected < pck_thresh).sum() / \
                len(joint_groups[j]) / len(err)
            pck_seq.append(pck)
        buff = [np.float32(err[:, all_joints] < t).sum() / len(err)
                / len(all_joints) for t in thresh]
        pck_curve.append(buff)
        pck = np.float32(err[:, all_joints] < pck_thresh).sum() / \
            len(err) / len(all_joints)
        pck_seq.append(pck)
        pck_curve_array.append(pck_curve)
        pck_array.append(pck_seq)
        auc_array.append(auc_seq)
    return pck_curve_array, pck_array, auc_array


# ------------------------------------------------------------- tests

def test_bone_norm_matches_reference_transcription():
    for _ in range(5):
        gt = _pose17()
        pred = gt * 1.7 + RNG.randn(3, 17) * 5
        args = (pred - pred[:, 14:15], gt - gt[:, 14:15],
                PARENTS_O1, SAFE_TRAVERSAL[1:])
        np.testing.assert_allclose(norm_by_bone_length(*args),
                                   _ref_norm_by_bone_length(*args),
                                   rtol=1e-6)


def test_bone_norm_pairing_is_loop_positional():
    # the parent of trav[i] is o1[i], NOT o1[trav[i]]: these differ for
    # 14 of 16 pairs (e.g. joint 15's metric parent is 1, not 14)
    trav = SAFE_TRAVERSAL[1:]
    pairs = [(trav[i], PARENTS_O1[i]) for i in range(len(trav))]
    assert (15, 1) in pairs
    anatomical = [(t, PARENTS_O1[t]) for t in trav]
    assert pairs != anatomical
    gt = _pose17()
    pred = gt + RNG.randn(3, 17) * 20
    out = norm_by_bone_length(pred - pred[:, 14:15], gt - gt[:, 14:15],
                              PARENTS_O1, trav)

    # regression guard vs the round-1 bug: anatomical pairing
    # (parent = o1[trav[i]]) must give a DIFFERENT result
    def _anatomical(pred, gt, o1, trav):
        o = pred.copy()
        for idx in trav:
            gt_len = np.linalg.norm(gt[:, idx] - gt[:, o1[idx]])
            vec = pred[:, idx] - pred[:, o1[idx]]
            o[:, idx] = o[:, o1[idx]] + vec * gt_len / np.linalg.norm(vec)
        return o

    buggy = _anatomical(pred - pred[:, 14:15], gt - gt[:, 14:15],
                        PARENTS_O1, trav)
    assert np.abs(out - buggy).max() > 1.0


def test_pck_aggregation_matches_reference_transcription():
    seq_err = []
    for _ in range(3):
        seq_err.append([np.abs(RNG.randn(17)) * 180 for _ in range(7)])
    ours = mpii_compute_3d_pck(seq_err)
    ref = _ref_mpii_compute_3d_pck(seq_err)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64), atol=1e-5)
    # headline reduction: mean of last entry over ALL sequences
    pck = compute_pck(seq_err)
    assert len(pck) == 3
    np.testing.assert_allclose(
        np.mean(pck), np.mean([row[-1] for row in ref[1]]), atol=1e-7)


def test_compute_pck_counts_empty_sequences():
    perfect = [[np.zeros(17)] * 5]
    empty = [[]]
    assert compute_pck(perfect + empty) == [1.0, 0.0]


def test_procrustes_recovers_rotation():
    gt = _pose17()
    theta = 0.4
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]])
    pred = R @ gt
    aligned = procrustes(pred, gt)
    np.testing.assert_allclose(aligned, gt, atol=1e-6)


def test_match_identical_poses():
    gts = [_pose17(), _pose17() + 500]
    preds = np.stack([gts[1], gts[0]])   # swapped order
    matches, matches_abs = match_poses(gts, preds)
    assert matches == [1, 0]


def test_match_threshold_rejects():
    gts = [_pose17()]
    preds = np.stack([gts[0] + RNG.randn(3, 17) * 50])
    matches, _ = match_poses(gts, preds, threshold=1.0)
    assert matches == [-1]
