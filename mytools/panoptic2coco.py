"""CMU Panoptic raw -> COCO-json converter.

Rebuild of the reference converter (ref: mytools/panoptic2coco.py):
reads the Panoptic ``hdPose3d_stage1_coco19`` body annotations plus the
per-sequence HD camera calibrations (panels (0,16) and (0,30)), applies the
y-up -> camera frame change of basis, projects world joints into each
camera with full distortion, and writes COCO-style jsons carrying both
``joints3d_img`` (pixel u,v + camera-depth) and ``joints3d`` (world, x10)
per annotation plus the camera K/R/t per image.

Split definitions (train sequences / haggling / mafia / ultimatum / pizza,
the subsampling intervals and totals, bbox expansion ratios) follow the
reference exactly so produced jsons are interchangeable.

Usage: python mytools/panoptic2coco.py --root data/panoptic
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp

import numpy as np

TRAIN_LIST = [
    '160224_haggling1', '160226_mafia2', '160224_mafia1', '160224_mafia2',
    '160224_ultimatum1', '160224_ultimatum2',
]

SPLITS = {
    'train': dict(seqs=TRAIN_LIST, interval=2, total=None, train=True),
    'haggling': dict(seqs=['160226_haggling1', '160422_haggling1'],
                     interval=None, total=2400, train=False),
    'mafia': dict(seqs=['160226_mafia1', '160422_mafia2'],
                  interval=None, total=2400, train=False),
    'ultimatum': dict(seqs=['160422_ultimatum1'],
                      interval=None, total=2400, train=False),
    'pizza': dict(seqs=['160906_pizza1'],
                  interval=None, total=2400, train=False),
}

JOINT_NAMES = ['neck', 'nose', 'mid-hip',
               'l-shoulder', 'l-elbow', 'l-wrist',
               'l-hip', 'l-knee', 'l-ankle',
               'r-shoulder', 'r-elbow', 'r-wrist',
               'r-hip', 'r-knee', 'r-ankle']
LIMBS = [[0, 1], [0, 2], [0, 3], [3, 4], [4, 5], [0, 9], [9, 10], [10, 11],
         [2, 6], [2, 12], [6, 7], [7, 8], [12, 13], [13, 14]]
NUM_JOINTS = 15
ROOT_ID = 2
CAM_LIST = [(0, 16), (0, 30)]
WIDTH, HEIGHT = 1920, 1080

# y-up world -> camera-convention change of basis
M_BASIS = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])


def project_with_distortion(X, K, R, t, kd):
    """Project world points (3,N) through a distorted pinhole; returns
    (3,N) rows [u, v, camera-z]."""
    x = R @ X + t
    x[0:2] = x[0:2] / (x[2] + 1e-5)
    r2 = x[0] ** 2 + x[1] ** 2
    radial = 1 + kd[0] * r2 + kd[1] * r2 ** 2 + kd[4] * r2 ** 3
    x0 = x[0] * radial + 2 * kd[2] * x[0] * x[1] + \
        kd[3] * (r2 + 2 * x[0] ** 2)
    x1 = x[1] * radial + 2 * kd[3] * x0 * x[1] + \
        kd[2] * (r2 + 2 * x[1] ** 2)
    x[0] = K[0, 0] * x0 + K[0, 1] * x1 + K[0, 2]
    x[1] = K[1, 0] * x0 + K[1, 1] * x1 + K[1, 2]
    return x


def load_cameras(root, seq):
    with open(osp.join(root, seq, f'calibration_{seq}.json')) as f:
        calib = json.load(f)
    cams = {}
    for cam in calib['cameras']:
        if (cam['panel'], cam['node']) in CAM_LIST:
            cams[(cam['panel'], cam['node'])] = dict(
                K=np.array(cam['K']),
                distCoef=np.array(cam['distCoef']),
                R=np.array(cam['R']) @ M_BASIS,
                t=np.array(cam['t']).reshape(3, 1))
    return cams


def to_jsonable(v):
    if isinstance(v, np.ndarray):
        return v.astype(np.float64).tolist()
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


def convert_split(root, split_name):
    spec = SPLITS[split_name]
    images, annos = [], []
    img_id, ann_id = 1, 1
    prev_ind = 0

    for seq in spec['seqs']:
        cameras = load_cameras(root, seq)
        anno_dir = osp.join(root, seq, 'hdPose3d_stage1_coco19')
        files = sorted(glob.glob(f'{anno_dir}/*.json'))
        joints_key = 'joints19'
        if not files:
            anno_dir = osp.join(root, seq, 'hdPose3d_stage1')
            files = sorted(glob.glob(f'{anno_dir}/*.json'))
            joints_key = 'joints15'
        total = None
        if spec['total']:
            total = spec['total'] // len(spec['seqs']) // len(cameras)

        for cam_key, cam in cameras.items():
            for i, file in enumerate(files):
                if spec['interval'] and i % spec['interval'] != 0 \
                        and not total:
                    continue
                with open(file) as f:
                    try:
                        bodies = json.load(f)['bodies']
                    except Exception:
                        continue
                if not bodies:
                    continue
                postfix = osp.basename(file).replace('body3DScene', '')
                prefix = '{:02d}_{:02d}'.format(*cam_key)
                image = osp.join(seq, 'hdImgs', prefix,
                                 prefix + postfix).replace('json', 'jpg')
                if not osp.exists(osp.join(root, image)):
                    continue

                img_inst = dict(id=img_id, width=WIDTH, height=HEIGHT,
                                file_name=image)
                img_annos = []
                invalid = 0
                for body in bodies:
                    pose3d = np.array(body[joints_key]).reshape(-1, 4)
                    pose3d = pose3d[:NUM_JOINTS]
                    joints_vis = pose3d[:, -1] > 0.1
                    if joints_key == 'joints19':
                        joints_vis[1] = False   # MPII convention: drop nose
                    pose3d = pose3d.copy()
                    pose3d[:, 0:3] = pose3d[:, 0:3] @ M_BASIS

                    pose_img = project_with_distortion(
                        pose3d[:, 0:3].T, cam['K'], cam['R'], cam['t'],
                        cam['distCoef']).T
                    pose2d = pose_img[:, :2]
                    inside = (pose2d[:, 0] >= 0) & \
                        (pose2d[:, 0] <= WIDTH - 1) & \
                        (pose2d[:, 1] >= 0) & (pose2d[:, 1] <= HEIGHT - 1)
                    vis_bbox = joints_vis.copy()
                    joints_vis = joints_vis & inside

                    if vis_bbox.sum() < 3:
                        invalid += 1
                        continue
                    xmin, ymin = pose2d[vis_bbox].min(0)
                    xmax, ymax = pose2d[vis_bbox].max(0)
                    w, h = xmax - xmin, ymax - ymin
                    if joints_key == 'joints19':
                        ymin, ymax = ymin - 0.30 * h, ymax + 0.15 * h
                    else:
                        ymin, ymax = ymin - 0.02 * h, ymax + 0.07 * h
                    xmin, xmax = xmin - 0.15 * w, xmax + 0.15 * w
                    xmin, xmax = np.clip([xmin, xmax], 0, WIDTH - 1)
                    ymin, ymax = np.clip([ymin, ymax], 0, HEIGHT - 1)
                    w, h = xmax - xmin + 1, ymax - ymin + 1
                    if w <= 1 or h <= 1 or w * h <= 64:
                        invalid += 1
                        continue

                    img_annos.append(dict(
                        id=ann_id + len(img_annos),
                        image_id=img_id,
                        category_id=1,
                        area=to_jsonable(w * h),
                        bbox=[to_jsonable(v) for v in [xmin, ymin, w, h]],
                        iscrowd=0,
                        joints2d=to_jsonable(pose2d),
                        joints2d_vis=to_jsonable(np.repeat(
                            joints_vis[:, None].astype(np.int32), 2, 1)),
                        joints3d_img=to_jsonable(pose_img),
                        joints3d=to_jsonable(pose3d[:, 0:3] * 10.0),
                        joints3d_vis=to_jsonable(np.repeat(
                            joints_vis[:, None].astype(np.int32), 3, 1)),
                        center2d=to_jsonable(pose_img[ROOT_ID]),
                        num_keypoints=int(joints_vis.sum())))
                if img_annos and (not spec['train'] or invalid == 0):
                    img_inst['cam'] = dict(K=cam['K'].tolist(),
                                           R=cam['R'].tolist(),
                                           t=cam['t'].tolist())
                    images.append(img_inst)
                    annos.extend(img_annos)
                    img_id += 1
                    ann_id += len(img_annos)

            if total:
                to_check = images[prev_ind:]
                checked = images[:prev_ind]
                sample = np.linspace(0, len(to_check) - 1,
                                     total).astype(int)
                images = checked + [to_check[s] for s in sample]
                keep_ids = set(x['id'] for x in images)
                annos = [a for a in annos if a['image_id'] in keep_ids]
                prev_ind += total

    db = dict(
        images=images, annotations=annos,
        categories=[dict(supercategory='person', id=1, name='person',
                         keypoints=JOINT_NAMES, skeleton=LIMBS)])
    out = osp.join(root, 'annotations', f'{split_name}.json')
    os.makedirs(osp.dirname(out), exist_ok=True)
    with open(out, 'w') as f:
        json.dump(db, f)
    print(f'{split_name}: {len(images)} images, {len(annos)} annotations '
          f'-> {out}')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', default='data/panoptic')
    parser.add_argument('--splits', nargs='+',
                        default=['train', 'haggling', 'mafia', 'ultimatum',
                                 'pizza'])
    args = parser.parse_args()
    for split in args.splits:
        convert_split(args.root, split)


if __name__ == '__main__':
    main()
