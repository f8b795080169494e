"""Dataset + evaluator tests on tiny synthetic fixtures
(test strategy mirrors the reference's miniature-annotation pattern,
SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from das_tpu.datasets import (CMUPanopticDataset, COCOKeypointsDataset,
                              build_dataset)
from das_tpu.datasets.pipelines import (GlobalRotScaleTransPose, Normalize,
                                        Pad, RandomFlipPose3D, Resize,
                                        ResizePose)

J = 15
F = 1000.0


def make_panoptic_json(tmpdir, n_images=2, n_people=2):
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        images.append(dict(
            id=i + 1, file_name=f'img_{i}.jpg', width=1920, height=1080,
            cam=dict(K=[[F, 0, 960.], [0, F, 540.], [0, 0, 1.]],
                     R=np.eye(3).tolist(), t=[[0.], [0.], [0.]])))
        for p in range(n_people):
            # joints in pixel+depth(cm)
            base = np.array([500 + 600 * p, 400, 300.0])
            joints = base + rng.randn(J, 3) * [80, 120, 20]
            world = None
            # joints3d (world, cm) consistent via pinhole: X = (u-cx)/f*z
            u, v, z = joints[:, 0], joints[:, 1], joints[:, 2]
            world = np.stack([(u - 960.) / F * z, (v - 540.) / F * z, z],
                             axis=1)
            bbox = [float(u.min()), float(v.min()),
                    float(u.max() - u.min()), float(v.max() - v.min())]
            annotations.append(dict(
                id=aid, image_id=i + 1, category_id=1,
                bbox=bbox, area=bbox[2] * bbox[3], iscrowd=0,
                joints3d_img=joints.tolist(),
                joints3d=world.tolist(),
                joints2d_vis=[[1, 1]] * J,
                joints3d_vis=[[1, 1, 1]] * J))
            aid += 1
    data = dict(images=images, annotations=annotations,
                categories=[dict(id=1, name='person')])
    path = os.path.join(tmpdir, 'panoptic_tiny.json')
    with open(path, 'w') as f:
        json.dump(data, f)
    return path


@pytest.fixture()
def panoptic_ds(tmp_path):
    ann = make_panoptic_json(str(tmp_path))
    return CMUPanopticDataset(
        ann_file=ann, data_root=None, img_prefix=str(tmp_path),
        pipeline=None, test_mode=True, norm_depth=True, abs_dz=True,
        depth_factor=1)


def test_panoptic_parse_ann(panoptic_ds):
    ann = panoptic_ds.get_ann_info(0)
    assert ann['gt_poses_3d'].shape[1] == 3 + 4 * J
    # abs_dz: root joint's stored z must be 0 (dz to itself)
    root = CMUPanopticDataset.ROOT_IDX
    np.testing.assert_allclose(
        ann['gt_poses_3d'][:, 3 + root * 3 + 2], 0, atol=1e-6)
    # depth normalised by focal
    assert (ann['depths'] < 10).all()


def test_panoptic_evaluate_perfect(panoptic_ds):
    """Feeding GT back as predictions must give ~0 MPJPE."""
    outputs = []
    for idx, img_id in enumerate(panoptic_ds.img_ids):
        ann = panoptic_ds.get_ann_info(idx)
        poses = ann['gt_poses_3d'][:, 3:3 + 3 * J].reshape(-1, J, 3).copy()
        # evaluator expects absolute root depth folded in (abs_dz preds
        # carry root depth at the root joint's z)
        root = CMUPanopticDataset.ROOT_IDX
        poses[..., 2] += ann['gt_poses_3d'][:, [2]]
        outputs.append(dict(
            poses=poses,
            vis=np.ones((len(poses), J)),
            scores=[1.0] * len(poses),
            image_paths=[panoptic_ds.data_infos[idx]['file_name']]))
    res = panoptic_ds.evaluate(outputs)
    assert res['mpjpe_mm'] < 1e-3, res


def test_panoptic_format_results_writes_reference_json(panoptic_ds,
                                                       tmp_path):
    """result_keypoints.json must carry the reference's entry schema
    (ref cmupanoptic_mono_dataset.py:314-359): image_id, category_id=1,
    flat 3J keypoints, score, xywh bbox from the keypoint extent."""
    outputs = []
    for idx in range(len(panoptic_ds)):
        ann = panoptic_ds.get_ann_info(idx)
        poses = ann['gt_poses_3d'][:, 3:3 + 3 * J].reshape(-1, J, 3).copy()
        outputs.append(dict(
            poses=poses, vis=np.ones((len(poses), J)),
            scores=[0.9] * len(poses),
            image_paths=[panoptic_ds.data_infos[idx]['file_name']]))
    res_folder = str(tmp_path / 'res')
    entries, res_file = panoptic_ds.format_results(outputs,
                                                   res_folder=res_folder)
    assert res_file == os.path.join(res_folder, 'result_keypoints.json')
    with open(res_file) as f:
        loaded = json.load(f)
    assert loaded == entries
    assert len(loaded) == sum(len(o['poses']) for o in outputs)
    e = loaded[0]
    assert set(e) == {'image_id', 'category_id', 'keypoints', 'score',
                      'bbox'}
    assert e['category_id'] == 1 and len(e['keypoints']) == 3 * J
    kpt = np.array(e['keypoints']).reshape(J, 3)
    np.testing.assert_allclose(
        e['bbox'], [kpt[:, 0].min(), kpt[:, 1].min(),
                    np.ptp(kpt[:, 0]), np.ptp(kpt[:, 1])])
    # evaluate(res_folder=...) writes the same artifact
    res2 = str(tmp_path / 'res2')
    panoptic_ds.evaluate(outputs, res_folder=res2)
    assert os.path.isfile(os.path.join(res2, 'result_keypoints.json'))


def make_coco_json(tmpdir):
    rng = np.random.RandomState(1)
    kpts = np.zeros((17, 3))
    kpts[:, 0] = rng.uniform(120, 260, 17)
    kpts[:, 1] = rng.uniform(120, 380, 17)
    kpts[:, 2] = 2
    data = dict(
        images=[dict(id=1, file_name='c.jpg', width=640, height=480)],
        annotations=[dict(
            id=1, image_id=1, category_id=1,
            bbox=[100, 100, 200, 300], area=60000, iscrowd=0, num_keypoints=17,
            keypoints=[float(x) for x in kpts.reshape(-1)])],
        categories=[dict(id=1, name='person')])
    path = os.path.join(tmpdir, 'coco_tiny.json')
    with open(path, 'w') as f:
        json.dump(data, f)
    return path


def test_coco_kpts_remap_panoptic(tmp_path):
    ann_file = make_coco_json(str(tmp_path))
    ds = COCOKeypointsDataset(ann_file=ann_file, data_root=None,
                              img_prefix=str(tmp_path), pipeline=None,
                              convert_ids='panoptic', classes=('person',),
                              test_mode=True)
    ann = ds.get_ann_info(0)
    assert ann is not None
    # panoptic-15 layout, depth-0 everywhere (2D-only samples)
    assert ann['gt_poses_3d'].shape[1] == 3 + 4 * 15
    uvd = ann['gt_poses_3d'][:, 3:3 + 45].reshape(-1, 15, 3)
    np.testing.assert_allclose(uvd[..., 2], 0)
    vis = ann['gt_poses_3d'][:, 3 + 45:]
    # joints 0 (neck) and 2 (mid-hip) have no COCO source -> invisible
    assert vis[0, 0] == 0 and vis[0, 2] == 0 and vis[0, 1] == 1


def test_build_dataset_concat(tmp_path):
    ann = make_panoptic_json(str(tmp_path))
    cfg = [
        dict(type='CMUPanopticDataset', ann_file=ann,
             img_prefix=str(tmp_path), pipeline=None, test_mode=True),
        dict(type='RepeatDataset', times=2,
             dataset=dict(type='CMUPanopticDataset', ann_file=ann,
                          img_prefix=str(tmp_path), pipeline=None,
                          test_mode=True)),
    ]
    ds = build_dataset(cfg)
    assert len(ds) == 2 + 4


# ------------------------------------------------------------- pipelines

def _fake_results(h=480, w=640, n=2, J=15):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    joints = np.stack([rng.uniform(100, w - 100, (n, J)),
                       rng.uniform(100, h - 100, (n, J)),
                       rng.uniform(1, 3, (n, J))], axis=-1)
    c2d = joints[:, 2].copy()
    poses = np.concatenate([
        c2d, joints.reshape(n, -1), np.ones((n, J))], -1).astype(np.float32)
    return dict(
        img=img, img_shape=img.shape, ori_shape=img.shape,
        img_fields=['img'], bbox_fields=['gt_bboxes'],
        gt_bboxes=np.array([[50, 50, 200, 200]] * n, np.float32),
        gt_labels=np.zeros(n, np.int64), gt_labels_3d=np.zeros(n, np.int64),
        centers2d=poses[:, :2].copy(), depths=poses[:, 2].copy(),
        gt_poses_3d=poses)


def test_resize_pose_scales_depth():
    r = _fake_results()
    depths0 = r['depths'].copy()
    t = ResizePose(scale_depth=True, abs_dz=True,
                   img_scale=(1333, 640), keep_ratio=True)
    out = t(r)
    sf = out['scale_factor'][:2]
    depth_scale = np.sqrt(sf.prod())
    np.testing.assert_allclose(out['depths'], depths0 / depth_scale,
                               rtol=1e-5)
    # abs_dz: joint dz unchanged
    J_ = 15
    joints = out['gt_poses_3d'][:, 3:3 + J_ * 3].reshape(-1, J_, 3)
    assert out['img'].shape[0] == 640 or out['img'].shape[1] == 1333


def test_random_flip_swaps_pairs():
    r = _fake_results()
    t = RandomFlipPose3D(flip_ratio_bev_horizontal=1.0, num_joints=15,
                         flip_pairs=[[3, 9]])
    joints0 = r['gt_poses_3d'][:, 3:3 + 45].reshape(-1, 15, 3).copy()
    w = r['img_shape'][1]
    out = t(r)
    joints = out['gt_poses_3d'][:, 3:3 + 45].reshape(-1, 15, 3)
    np.testing.assert_allclose(joints[:, 3, 0], w - joints0[:, 9, 0] - 1,
                               rtol=1e-5)
    np.testing.assert_allclose(joints[:, 9, 1], joints0[:, 3, 1], rtol=1e-5)


def test_affine_identity_when_no_aug():
    r = _fake_results()
    joints0 = r['gt_poses_3d'].copy()
    t = GlobalRotScaleTransPose(
        rot_range=[0, 0], scale_ratio_range=[1, 1], translation_std=[0, 0],
        num_joints=15, scale_depth=True, abs_dz=True)
    out = t(r)
    assert out is not None
    np.testing.assert_allclose(
        out['gt_poses_3d'][:, :3 + 45], joints0[:, :3 + 45], atol=1e-3)


def test_grst_abs_dz_deviation_from_reference():
    """Pin the DELIBERATE abs_dz deviation (ref transforms_3d.py:1000-1003).

    The reference executes ``joints_depth[0] *= scale`` on a
    (batch, J+1, 1) array — scaling every joint depth of the FIRST
    PERSON, contradicting its own documented abs_dz semantics (root
    absolute, joint dz relative). This repo scales the ROOT depth of
    EVERY person by default, and reproduces the reference's literal
    behavior only under ``abs_dz_ref_compat=True``. If either branch
    silently changes, this test fails.
    """
    J, scale = 15, 1.2

    def reference_depth_update(depth, s):
        # independent transcription of transforms_3d.py:996-1003
        d = depth.copy()          # (batch, J+1, 1)
        d[0] = d[0] * s           # first PERSON, all its joints
        return d

    def make(**kw):
        t = GlobalRotScaleTransPose(
            rot_range=[0, 0], scale_ratio_range=[scale, scale],
            translation_std=[0, 0], num_joints=J, scale_depth=True,
            abs_dz=True, **kw)
        out = t(_fake_results())
        assert out is not None
        return out['gt_poses_3d'][:, :3 + J * 3] \
            .reshape(-1, J + 1, 3)[..., 2]

    depth_in = _fake_results()['gt_poses_3d'][:, :3 + J * 3] \
        .reshape(-1, J + 1, 3)[..., [2]]

    # default: root depth of every person scales, joint dz unchanged
    d_repo = make()
    expect_repo = depth_in[..., 0].copy()
    expect_repo[:, 0] *= scale
    np.testing.assert_allclose(d_repo, expect_repo, rtol=1e-6)

    # ref_compat: bit-match the transcribed reference behavior
    d_ref = make(abs_dz_ref_compat=True)
    np.testing.assert_allclose(
        d_ref, reference_depth_update(depth_in, scale)[..., 0], rtol=1e-6)

    # and the two semantics genuinely diverge (>1 person input)
    assert not np.allclose(d_repo, d_ref)


def test_pad_divisor():
    r = _fake_results(h=470, w=630)
    out = Pad(size_divisor=32)(r)
    assert out['img'].shape[0] % 32 == 0 and out['img'].shape[1] % 32 == 0
