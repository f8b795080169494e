"""Fused-decode parity vs an independent numpy implementation of the
reference decode semantics (das_head.py:690-796)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from das_tpu.core.decode import decode_single_image
from das_tpu.core.targets import make_points
from das_tpu.ops.oks_nms import default_sigmas, oks_iou_np

RNG = np.random.RandomState(3)


def np_reference_decode(cls_scores, pose_preds, centernesses, points_list,
                        scale_factor, J, nms_pre, nms_post, nms_thr,
                        score_thr):
    """Straight numpy transcription of the decode contract."""
    all_scores, all_poses, all_centers = [], [], []
    depth_scale = np.sqrt(scale_factor[0] * scale_factor[1])
    for cls, pose, ctr, pts in zip(cls_scores, pose_preds, centernesses,
                                   points_list):
        scores = 1 / (1 + np.exp(-cls.reshape(-1)))
        ctrness = 1 / (1 + np.exp(-ctr.reshape(-1)))
        pp = pose.reshape(-1, pose.shape[-1]).astype(np.float64)
        pts = pts.copy()
        if len(scores) > nms_pre:
            order = np.argsort(-(scores * ctrness))[:nms_pre]
            scores, ctrness, pp, pts = scores[order], ctrness[order], \
                pp[order], pts[order]
        root2d = pts - pp[:, :2]
        depth = pp[:, 2] * depth_scale
        centers = np.stack([root2d[:, 0] / scale_factor[0],
                            root2d[:, 1] / scale_factor[1], depth], -1)
        joints = pp[:, 3:3 + 3 * J].reshape(-1, J, 3)
        roots = np.concatenate([pts, depth[:, None]], -1)[:, None]
        joints = joints + roots
        joints[..., 0] /= scale_factor[0]
        joints[..., 1] /= scale_factor[1]
        all_scores.append(scores * ctrness)
        all_poses.append(joints)
        all_centers.append(centers)
    nms_scores = np.concatenate(all_scores)
    poses = np.concatenate(all_poses)
    centers = np.concatenate(all_centers)
    valid = nms_scores > score_thr
    nms_scores, poses, centers = nms_scores[valid], poses[valid], \
        centers[valid]
    order = np.argsort(-nms_scores)
    nms_scores, poses, centers = nms_scores[order], poses[order], \
        centers[order]
    # greedy hard OKS NMS
    areas = (poses[..., 0].max(1) - poses[..., 0].min(1)) * \
            (poses[..., 1].max(1) - poses[..., 1].min(1))
    sig = default_sigmas(J)
    keep = []
    alive = list(range(len(poses)))
    while alive:
        i = alive.pop(0)
        keep.append(i)
        flat = np.concatenate(
            [poses[i, :, :2],
             np.ones((J, 1))], -1).flatten()
        if alive:
            others = np.stack([np.concatenate(
                [poses[j, :, :2], np.ones((J, 1))], -1).flatten()
                for j in alive])
            ious = oks_iou_np(flat, others, areas[i],
                              areas[np.array(alive)], sig)
            alive = [a for a, iou in zip(alive, ious) if iou <= nms_thr]
    keep = keep[:nms_post]
    return nms_scores[keep], poses[keep], centers[keep]


def test_decode_matches_numpy_reference():
    J = 4
    shapes = [(8, 8), (4, 4)]
    strides = (8, 16)
    nms_pre, nms_post, nms_thr, score_thr = 20, 5, 0.9, 0.07
    scale_factor = np.array([0.75, 0.8], np.float32)

    cls = [RNG.randn(h, w, 1).astype(np.float32) * 2 for h, w in shapes]
    pose = [RNG.randn(h, w, 3 + 6 * J).astype(np.float32) * 3
            for h, w in shapes]
    ctr = [RNG.randn(h, w, 1).astype(np.float32) for h, w in shapes]

    pts_np, _, _ = make_points(shapes, strides)
    pts_list, begin = [], 0
    for (h, w) in shapes:
        pts_list.append(pts_np[begin:begin + h * w])
        begin += h * w

    ref_scores, ref_poses, ref_centers = np_reference_decode(
        cls, pose, ctr, pts_list, scale_factor, J, nms_pre, nms_post,
        nms_thr, score_thr)

    out = decode_single_image(
        [jnp.asarray(c) for c in cls], [jnp.asarray(p) for p in pose],
        [jnp.asarray(c) for c in ctr],
        [jnp.asarray(p) for p in pts_list],
        jnp.asarray(scale_factor), J, nms_pre, nms_post, nms_thr,
        score_thr)
    valid = np.asarray(out['valid'])
    got_scores = np.asarray(out['scores'])[valid]
    got_poses = np.asarray(out['poses'])[valid]
    got_centers = np.asarray(out['centers'])[valid]

    assert len(got_scores) == len(ref_scores)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-4)
    np.testing.assert_allclose(got_poses, ref_poses, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_centers, ref_centers, rtol=1e-3,
                               atol=1e-3)


def test_soft_oks_nms_matches_numpy_reference():
    from das_tpu.ops.oks_nms import soft_oks_nms_fixed, soft_oks_nms_np

    J, M = 5, 24
    for trial in range(4):
        rng = np.random.RandomState(100 + trial)
        # clusters of overlapping poses so rescoring actually reorders
        base = rng.rand(6, 1, 2) * 300
        kpts = (base[rng.randint(0, 6, M)] +
                rng.randn(M, J, 2) * 12).astype(np.float32)
        scores = rng.rand(M).astype(np.float32)
        order = np.argsort(-scores)           # fixed impl wants sorted
        kpts, scores = kpts[order], scores[order]
        areas = ((kpts[..., 0].max(1) - kpts[..., 0].min(1)) *
                 (kpts[..., 1].max(1) - kpts[..., 1].min(1)))
        sig = default_sigmas(J)
        max_dets = 8

        db = [dict(score=scores[i],
                   keypoints=np.concatenate(
                       [kpts[i], np.ones((J, 1), np.float32)], -1),
                   area=areas[i]) for i in range(M)]
        ref_keep = soft_oks_nms_np(db, thr=0.9, max_dets=max_dets,
                                   sigmas=sig)

        gather, out_valid = soft_oks_nms_fixed(
            jnp.asarray(kpts), jnp.asarray(scores), jnp.asarray(areas),
            jnp.ones(M, bool), 0.9, max_dets, sig)
        got = np.asarray(gather)[np.asarray(out_valid)]
        np.testing.assert_array_equal(got, np.asarray(ref_keep))


def test_decode_soft_nms_selection_order_and_scores():
    """nms_type='soft' plumbs through decode: selected in rescored order,
    but output scores are the ORIGINAL ones (ref das_head.py:790-794)."""
    from das_tpu.ops.oks_nms import soft_oks_nms_np

    J = 4
    shapes = [(8, 8)]
    strides = (8,)
    scale_factor = np.array([1.0, 1.0], np.float32)
    rng = np.random.RandomState(11)
    cls = [rng.randn(8, 8, 1).astype(np.float32) * 2]
    pose = [rng.randn(8, 8, 3 + 6 * J).astype(np.float32) * 3]
    ctr = [rng.randn(8, 8, 1).astype(np.float32)]
    pts_np, _, _ = make_points(shapes, strides)

    out = decode_single_image(
        [jnp.asarray(cls[0])], [jnp.asarray(pose[0])],
        [jnp.asarray(ctr[0])], [jnp.asarray(pts_np)],
        jnp.asarray(scale_factor), J, 64, 6, 0.9, 0.07, nms_type='soft')
    valid = np.asarray(out['valid'])
    got_scores = np.asarray(out['scores'])[valid]
    got_poses = np.asarray(out['poses'])[valid]

    # numpy: same candidate construction, then soft_oks_nms_np
    scores = 1 / (1 + np.exp(-cls[0].reshape(-1)))
    ctrn = 1 / (1 + np.exp(-ctr[0].reshape(-1)))
    pp = pose[0].reshape(-1, 3 + 6 * J).astype(np.float64)
    depth = pp[:, 2]
    joints = pp[:, 3:3 + 3 * J].reshape(-1, J, 3) + np.concatenate(
        [pts_np, depth[:, None]], -1)[:, None]
    nms_scores = scores * ctrn
    keep_mask = nms_scores > 0.07
    joints, nms_scores = joints[keep_mask], nms_scores[keep_mask]
    order = np.argsort(-nms_scores)
    joints, nms_scores = joints[order], nms_scores[order]
    areas = ((joints[..., 0].max(1) - joints[..., 0].min(1)) *
             (joints[..., 1].max(1) - joints[..., 1].min(1)))
    sig = default_sigmas(J)
    db = [dict(score=nms_scores[i],
               keypoints=np.concatenate(
                   [joints[i, :, :2], np.ones((J, 1))], -1),
               area=areas[i]) for i in range(len(joints))]
    ref_keep = soft_oks_nms_np(db, thr=0.9, max_dets=6, sigmas=sig)

    np.testing.assert_allclose(got_scores, nms_scores[ref_keep], rtol=1e-4)
    np.testing.assert_allclose(got_poses, joints[ref_keep], rtol=1e-3,
                               atol=1e-3)
