# MuCo-3DHP + COCO mixed training / MuPoTS-3D eval dataset base
# (ref recipe: /root/reference/configs/_base_/datasets/muco.py; unlike the
# reference this file is self-contained).
class_names = ['person']
num_joints = 21
use_bbox_center = False
abs_dz = True

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)

test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotationsPose3D', with_pose_3d=True,
         with_label_3d=False),
    dict(type='MultiScaleFlipAug',
         flip_pairs=((2, 5), (3, 6), (4, 7), (8, 11), (9, 12), (10, 13), (17, 18), (19, 20)),
         img_scale=(1280, 768),
         flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='Normalize', **img_norm_cfg),
             dict(type='Pad', size_divisor=32),
             dict(type='Collect3D', keys=['img', 'gt_poses_3d', 'depths']),
         ])
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    val=dict(
        type='MuPots3DHP',
        data_root='data/mupots',
        ann_file='annotations/MuPoTS-3D.json',
        norm_depth=True,
        abs_dz=abs_dz,
        depth_factor=1,
        pipeline=test_pipeline,
        test_mode=True),
    test=dict(
        type='MuPots3DHP',
        data_root='data/mupots',
        ann_file='annotations/MuPoTS-3D.json',
        norm_depth=True,
        abs_dz=abs_dz,
        depth_factor=1,
        pipeline=test_pipeline,
        test_mode=True),
)
