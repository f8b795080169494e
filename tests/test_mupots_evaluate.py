"""End-to-end MuPoTS evaluate() on a fully synthetic on-disk fixture:
COCO json + TS*/annot.mat + TS*/occlusion.mat (scipy object-cell arrays
in the reference's layout, ref mupots_3dhp.py:353-374,585). Perfect
camera-space predictions must give 3DPCK == 100 through the complete
pipeline: depth denorm -> pixel2world -> per-sequence matlab protocol
(matching, depth-ratio, bone-norm) -> PCK aggregation."""

import json
import os

import numpy as np
import pytest

from das_tpu.datasets.mupots import MuPots3DHP

F_X = 1500.0
CX, CY = 960.0, 540.0
J_EVAL = 17       # evaluated joints
J_ANN = 21        # joints carried by the json annotations
ROOT = 14


def _make_pose(rng):
    """Random camera-space pose (3, 17) in mm with well-formed bones."""
    base = np.array([rng.uniform(-300, 300), rng.uniform(-200, 200),
                     rng.uniform(2500, 3500)])
    joints = base[:, None] + rng.uniform(-400, 400, (3, J_EVAL))
    joints[2] = np.maximum(joints[2], 1500.0)
    return joints


def make_mupots_root(tmp_path, n_seq=20, n_frames=1, n_people=2):
    import scipy.io as sio

    rng = np.random.RandomState(5)
    root = str(tmp_path / 'mupots')
    images, annotations = [], []
    aid = 1
    gt_by_image = {}
    for ts in range(n_seq):
        seq_dir = os.path.join(root, f'TS{ts + 1}')
        os.makedirs(seq_dir, exist_ok=True)
        cell = np.empty((n_frames, n_people), object)
        occ = np.empty((n_frames, n_people), object)
        for i in range(n_frames):
            img_id = ts * n_frames + i + 1
            rel = f'TS{ts + 1}/img_{i:06d}.jpg'
            images.append(dict(
                id=img_id, file_name=rel, width=1920, height=1080,
                intrinsic=[F_X, F_X, CX, CY]))
            gt_by_image[rel] = []
            for p in range(n_people):
                annot3 = _make_pose(rng)                   # (3, 17) mm
                u = F_X * annot3[0] / annot3[2] + CX
                v = F_X * annot3[1] / annot3[2] + CY
                annot2 = np.stack([u, v])
                s = np.zeros((1, 1), dtype=[
                    ('annot2', 'O'), ('annot3', 'O'),
                    ('univ_annot3', 'O'), ('isValidFrame', 'O')])
                s[0, 0] = (annot2, annot3, annot3.copy(),
                           np.array([[1]]))
                cell[i, p] = s
                occ[i, p] = np.zeros((1, J_EVAL))
                gt_by_image[rel].append(annot3)

                kpt_img = np.zeros((J_ANN, 2))
                kpt_img[:J_EVAL] = np.stack([u, v], 1)
                kpt_img[J_EVAL:] = kpt_img[:J_ANN - J_EVAL]
                kpt_cam = np.zeros((J_ANN, 3))
                kpt_cam[:J_EVAL] = annot3.T
                kpt_cam[J_EVAL:] = kpt_cam[:J_ANN - J_EVAL]
                bbox = [float(u.min()), float(v.min()),
                        float(np.ptp(u)), float(np.ptp(v))]
                annotations.append(dict(
                    id=aid, image_id=img_id, category_id=1, iscrowd=0,
                    bbox=bbox, area=bbox[2] * bbox[3],
                    keypoints_img=kpt_img.tolist(),
                    keypoints_cam=kpt_cam.tolist(),
                    keypoints_vis=[1] * J_ANN))
                aid += 1
        sio.savemat(os.path.join(seq_dir, 'annot.mat'),
                    {'annotations': cell})
        sio.savemat(os.path.join(seq_dir, 'occlusion.mat'),
                    {'occlusion_labels': occ})
    ann_dir = os.path.join(root, 'annotations')
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, 'MuPoTS-3D.json'), 'w') as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name='person')]), f)
    return root, gt_by_image


def _perfect_outputs(ds, gt_by_image):
    """Model-layout outputs that decode back to the exact GT poses."""
    outputs = []
    for info in ds.data_infos:
        rel = info['file_name']
        norm = np.sqrt(F_X * F_X)
        poses = []
        for annot3 in gt_by_image[rel]:
            u = F_X * annot3[0] / annot3[2] + CX
            v = F_X * annot3[1] / annot3[2] + CY
            z_root = annot3[2, ROOT] / norm
            z = z_root + (annot3[2] - annot3[2, ROOT])
            z[ROOT] = z_root
            poses.append(np.stack([u, v, z], 1))
        poses = np.asarray(poses)
        outputs.append(dict(
            poses=poses, vis=np.ones(poses.shape[:2]),
            scores=[1.0] * len(poses),
            image_paths=[os.path.join(ds.data_root, rel)]))
    return outputs


@pytest.fixture(scope='module')
def mupots_root(tmp_path_factory):
    return make_mupots_root(tmp_path_factory.mktemp('mupots_data'))


def _build(root, **kw):
    return MuPots3DHP(
        data_root=root, ann_file='annotations/MuPoTS-3D.json',
        norm_depth=True, abs_dz=True, depth_factor=1, pipeline=None,
        num_workers=1, **kw)


def test_mupots_evaluate_perfect_pck(mupots_root, capsys):
    root, gt = mupots_root
    ds = _build(root)
    res = ds.evaluate(_perfect_outputs(ds, gt))
    assert res['PCK_MEAN:'] == '100.00'
    assert res['PCK_MEAN_ABS:'] == '100.00'
    # every joint visible -> the occluded split has no denominator, but
    # the visible split must be perfect
    assert res.get('pck_visible', 1.0) == 1.0
    for s in range(20):
        assert res[f'pck_TS{s + 1}'] == 1.0
    # the per-sequence table is printed in one block
    out = capsys.readouterr().out
    assert 'TS20' in out and 'All_abs' in out


def test_mupots_eval_seq_restricts_to_one_sequence(mupots_root):
    root, gt = mupots_root
    ds = _build(root, eval_seq=0)
    assert all('TS1/' in info['file_name'] for info in ds.data_infos)
    res = ds.evaluate(_perfect_outputs(ds, gt))
    assert res['PCK_MEAN:'] == '100.00'
    assert 'pck_TS1' in res and 'pck_TS2' not in res


def test_mupots_format_results_written(mupots_root, tmp_path):
    root, gt = mupots_root
    ds = _build(root, eval_seq=0)
    outputs = _perfect_outputs(ds, gt)
    entries, res_file = ds.format_results(outputs,
                                          res_folder=str(tmp_path))
    with open(res_file) as f:
        loaded = json.load(f)
    assert len(loaded) == sum(len(o['poses']) for o in outputs)
    assert len(loaded[0]['keypoints']) == 3 * ds.num_joints
