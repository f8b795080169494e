"""Flip-test averaging (BASELINE rung #2): MultiScaleFlipAug(flip=True)
view production, decoded-output unflipping, and merge averaging.

The reference's aug_test raises NotImplementedError (ref das.py:41-43);
this is the das_tpu implementation of the full path.
"""

import numpy as np
import pytest

from das_tpu.apis.test import (_sample_views, _sweep, _unflip_result,
                               merge_flip_results)
from das_tpu.datasets.pipelines import MultiScaleFlipAug

J = 15
PAIRS = [[3, 9], [4, 10], [5, 11], [6, 12], [7, 13], [8, 14]]


def _person(x, y, z=2.0):
    pose = np.zeros((J, 3), np.float32)
    pose[:, 0] = x + np.arange(J)
    pose[:, 1] = y + np.arange(J) * 0.5
    pose[:, 2] = z
    return pose


def _mirror(pose, W):
    out = pose.copy()
    out[:, 0] = W - 1 - out[:, 0]
    for a, b in PAIRS:
        out[[a, b]] = out[[b, a]]
    return out


def test_msfa_flip_produces_mirrored_view():
    img = np.zeros((64, 96, 3), np.float32)
    img[10:20, 5:15] = 1.0
    aug = MultiScaleFlipAug(
        transforms=[dict(type='Collect3D', keys=['img'])],
        img_scale=(96, 64), flip=True, flip_pairs=PAIRS)
    out = aug(dict(img=img, ori_shape=img.shape, img_shape=img.shape,
                   scale_factor=np.ones(4, np.float32), filename='x'))
    views = _sample_views(out)
    assert len(views) == 2
    assert views[0]['img_metas']['flip'] is False
    assert views[1]['img_metas']['flip'] is True
    np.testing.assert_array_equal(views[1]['img'],
                                  views[0]['img'][:, ::-1])
    assert views[1]['img_metas']['flip_pairs'] == PAIRS


def test_unflip_inverts_mirror():
    W = 200
    direct = _person(40, 25)
    res_flipped = dict(poses=_mirror(direct, W)[None],
                       centers=np.array([[W - 1 - 40, 25, 2.0]],
                                        np.float32),
                       vis=np.ones((1, J), np.float32),
                       scores=[0.9], image_paths=['a'])
    un = _unflip_result(res_flipped, W, PAIRS)
    np.testing.assert_allclose(un['poses'][0], direct, atol=1e-5)
    np.testing.assert_allclose(un['centers'][0, 0], 40, atol=1e-5)


def test_merge_averages_matched_people():
    direct = dict(poses=np.stack([_person(40, 25), _person(120, 30)]),
                  centers=np.array([[40, 25, 2.], [120, 30, 2.]],
                                   np.float32),
                  vis=np.ones((2, J), np.float32),
                  scores=[0.9, 0.8], image_paths=['a'])
    # flipped view sees the same people slightly shifted (+2 px in x)
    flipped = dict(poses=np.stack([_person(122, 30), _person(42, 25)]),
                   centers=np.array([[122, 30, 2.], [42, 25, 2.]],
                                    np.float32),
                   vis=np.ones((2, J), np.float32),
                   scores=[0.85, 0.88], image_paths=['a'])
    merged = merge_flip_results(direct, flipped)
    np.testing.assert_allclose(merged['poses'][0][:, 0],
                               _person(41, 25)[:, 0], atol=1e-5)
    np.testing.assert_allclose(merged['poses'][1][:, 0],
                               _person(121, 30)[:, 0], atol=1e-5)
    # y also averaged (same here), z averaged
    np.testing.assert_allclose(merged['centers'][:, 0], [41, 121],
                               atol=1e-5)


def test_merge_keeps_unmatched_direct_people():
    direct = dict(poses=_person(40, 25)[None],
                  centers=np.array([[40, 25, 2.]], np.float32),
                  vis=np.ones((1, J), np.float32),
                  scores=[0.9], image_paths=['a'])
    flipped = dict(poses=_person(190, 80)[None],
                   centers=np.array([[190, 80, 2.]], np.float32),
                   vis=np.ones((1, J), np.float32),
                   scores=[0.5], image_paths=['a'])
    merged = merge_flip_results(direct, flipped)
    np.testing.assert_array_equal(merged['poses'], direct['poses'])


def test_merge_crowded_scene_greedy_matching():
    """Crowded scene: people closer together than the pose extent. The
    greedy root-distance matcher must (a) pair each direct person with
    its own flipped twin, never a neighbour's, (b) consume each flipped
    person at most once, (c) leave far-away flipped detections unused.

    Pins the match_frac=0.5-of-extent threshold semantics documented in
    docs/migration.md."""
    # pose extent is ~J px (see _person); people spaced 10 px apart —
    # well inside each other's extent, so the threshold alone cannot
    # separate them: greedy nearest-first pairing must.
    xs = [40, 50, 60]
    direct = dict(
        poses=np.stack([_person(x, 25) for x in xs]),
        centers=np.array([[x, 25, 2.0] for x in xs], np.float32),
        vis=np.ones((3, J), np.float32),
        scores=[0.9, 0.8, 0.7], image_paths=['a'])
    # flipped view: each person +2 px, plus one spurious far detection
    flipped = dict(
        poses=np.stack([_person(x + 2, 25) for x in xs]
                       + [_person(150, 90)]),
        centers=np.array([[x + 2, 25, 2.0] for x in xs]
                         + [[150, 90, 2.0]], np.float32),
        vis=np.ones((4, J), np.float32),
        scores=[0.85, 0.8, 0.75, 0.4], image_paths=['a'])
    merged = merge_flip_results(direct, flipped)
    # every person averaged with ITS OWN twin: x -> x + 1
    np.testing.assert_allclose(merged['centers'][:, 0],
                               [x + 1 for x in xs], atol=1e-5)
    for i, x in enumerate(xs):
        np.testing.assert_allclose(merged['poses'][i][:, 0],
                                   _person(x + 1, 25)[:, 0], atol=1e-5)


def test_sweep_flip_merge_end_to_end(monkeypatch):
    """Drive _sweep with a fake predict: detects the bright blob, with an
    asymmetric +2px x-bias. Flip-test must halve the bias for a mirrored
    scene, proving view routing, unflip, and averaging work together."""
    import das_tpu.apis.test as test_mod

    H, W = 64, 96
    BIAS = 2.0

    def fake_make_predict_fn(model, test_cfg, num_joints, strides):
        def predict(variables, imgs, sfs):
            B = imgs.shape[0]
            K = 4
            poses = np.zeros((B, K, num_joints, 3), np.float32)
            valid = np.zeros((B, K), bool)
            centers = np.zeros((B, K, 3), np.float32)
            for b in range(B):
                ys, xs = np.nonzero(imgs[b, :, :, 0] > 0.5)
                cx, cy = xs.mean() + BIAS, ys.mean()
                poses[b, 0, :, 0] = cx
                poses[b, 0, :, 1] = cy
                poses[b, 0, :, 2] = 2.0
                # make joint 3 vs 9 asymmetric so pair swap is observable
                poses[b, 0, 3, 0] = cx + 5
                poses[b, 0, 9, 0] = cx - 5
                centers[b, 0] = (cx, cy, 2.0)
                valid[b, 0] = True
            return dict(scores=np.where(valid, 0.9, 0.0),
                        poses=poses, centers=centers,
                        vis=np.ones((B, K, num_joints), np.float32),
                        valid=valid)
        return predict

    monkeypatch.setattr(test_mod, 'make_predict_fn', fake_make_predict_fn)

    img = np.zeros((H, W, 3), np.float32)
    img[20:30, 30:40] = 1.0          # blob center x = 34.5
    meta = dict(filename='a.jpg', ori_shape=(H, W, 3),
                scale_factor=np.ones(4, np.float32))

    def get_sample(i):
        return dict(
            img=[img, np.ascontiguousarray(img[:, ::-1])],
            img_metas=[dict(meta, flip=False, flip_pairs=PAIRS),
                       dict(meta, flip=True, flip_pairs=PAIRS)])

    class Cfg:
        pass

    from das_tpu.config import Config
    cfg = Config(dict(model=dict(
        bbox_head=dict(num_joints=J, strides=[8, 16, 32, 64]),
        test_cfg=dict(nms_post=4))))

    res = _sweep(None, None, get_sample, 1, cfg, batch_size=2,
                 progress=False)[0]
    # direct: x = 34.5 + 2. flipped blob at W-1-34.5=60.5 -> pred 62.5,
    # unflip -> 95-62.5 = 32.5. average = (36.5+32.5)/2 = 34.5:
    # bias cancelled exactly.
    np.testing.assert_allclose(res['centers'][0, 0], 34.5, atol=1e-4)
    # pair-swapped joints: flipped unflipped
    # swaps them back so the average keeps the asymmetry centred
    np.testing.assert_allclose(res['poses'][0, 3, 0] +
                               res['poses'][0, 9, 0], 2 * 34.5, atol=1e-3)


def test_sample_views_plain_sample_with_list_metas():
    """A non-MSFA sample whose metas contain plain lists must stay ONE
    view (regression: list-valued scale_factor fabricated phantom views)."""
    s = dict(img=np.zeros((4, 4, 3), np.float32),
             img_metas=dict(scale_factor=[1.0, 1.0, 1.0, 1.0]),
             extra=[1, 2, 3])
    views = _sample_views(s)
    assert len(views) == 1
    assert views[0] is s
