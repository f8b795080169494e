# DAS on CMU Panoptic (ref recipe: /root/reference/configs/das/exp_panoptic.py).
_base_ = [
    '../_base_/datasets/panoptic_monocular.py', '../_base_/models/das.py',
    '../_base_/schedules/mmdet_schedule_1x.py', '../_base_/default_runtime.py'
]

fpn_channels = 256
num_joints = 15
use_bbox_center = False
abs_dz = True

model = dict(
    pretrained='weights/2xmspn50_coco_256x192-c8765a5c_20201123.pth',
    backbone=dict(
        _delete_=True,
        type='MSPN2',
        unit_channels=256,
        num_stages=2,
        num_units=4,
        num_blocks=[3, 4, 6, 3],
        norm_cfg=dict(type='SyncBN'),
        frozen_stages=1,
        norm_eval=False,
        # v5e: rematerialise stages under grad; without it the B=8
        # 512x960 train step needs 28G of the 15.75G HBM
        remat=True,
    ),
    neck=dict(
        type='FPN',
        in_channels=[256, 256, 256, 256],
        out_channels=fpn_channels,
        norm_cfg=dict(type='SyncBN'),
        num_outs=4,
    ),
    bbox_head=dict(
        type='DASHead',
        remat=True,
        in_channels=fpn_channels,
        feat_channels=fpn_channels,
        regress_ranges=((-1, 80), (80, 160), (160, 320), (320, 1e8),),
        strides=[8, 16, 32, 64],
        num_joints=num_joints,
        depth_factor=20,
        z_norm=50,
        root_idx=2,
        recursive_update=dict(
            num_joints=num_joints,
        ),
    ),
    train_cfg=dict(
        code_weight=[1.0, 1.0, 1] + [2] * num_joints * 6,
        # TPU addition (loss- and gradient-bitwise-identical, pinned by
        # tests/test_model.py): run the recursive-update re-sampling only
        # at the assigned positive points — the loss never reads the
        # refined field anywhere else
        sparse_refine=True),
    test_cfg=dict(
        nms_across_levels=False,
        nms_pre=1000,
        nms_post=100,
        nms_thr=0.9,
        score_thr=0.07,
        # TPU addition (decode-identical): refine joint offsets only at
        # the nms_pre candidates the decode will rank anyway
        sparse_refine=True,
    ),
)

img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)

train_pipeline = [
    dict(type='LoadImageFromFile', to_float32=True),
    dict(type='LoadAnnotationsPose3D', with_bbox=True, with_label=True),
    dict(type='ResizePose',
         scale_depth=True,
         abs_dz=abs_dz,
         img_scale=[(1333, 512), (1333, 640)], multiscale_mode='range',
         keep_ratio=True),
    dict(type='RandomFlipPose3D', flip_ratio_bev_horizontal=0.5,
         flip_pairs=[[3, 9], [4, 10], [5, 11], [6, 12], [7, 13], [8, 14]],
         num_joints=num_joints),
    dict(type='PhotoMetricDistortion',
         brightness_delta=32,
         contrast_range=(0.7, 1.3),
         saturation_range=(0.7, 1.3),
         hue_delta=18),
    dict(type='GlobalRotScaleTransPose',
         scale_depth=True,
         abs_dz=abs_dz,
         rot_range=[-0.0, 0.0],
         scale_ratio_range=[0.6, 1.4],
         translation_std=[0.15, 0.15],
         num_joints=num_joints,
         img_norm_cfg=img_norm_cfg,
         use_bbox_center=use_bbox_center),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect3D',
         keys=['img', 'gt_bboxes', 'gt_labels', 'gt_poses_3d',
               'gt_labels_3d', 'centers2d', 'depths'],
         num_joints=num_joints),
]

train_pipeline_coco = [
    dict(type='LoadImageFromFile', to_float32=True),
    dict(type='LoadAnnotationsPose3D', with_bbox=True, with_label=True),
    dict(type='ResizePose',
         img_scale=[(1333, 512), (1333, 640)], multiscale_mode='range',
         keep_ratio=True),
    dict(type='RandomFlipPose3D', flip_ratio_bev_horizontal=0.5,
         flip_pairs=[[3, 9], [4, 10], [5, 11], [6, 12], [7, 13], [8, 14]],
         num_joints=num_joints),
    dict(type='PhotoMetricDistortion',
         brightness_delta=32,
         contrast_range=(0.8, 1.2),
         saturation_range=(0.8, 1.2),
         hue_delta=14),
    dict(type='GlobalRotScaleTransPose',
         scale_depth=True,
         rot_range=[-0.15, 0.15],
         scale_ratio_range=[0.8, 1.2],
         translation_std=[0.15, 0.15],
         num_joints=num_joints,
         img_norm_cfg=img_norm_cfg,
         use_bbox_center=use_bbox_center),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect3D',
         keys=['img', 'gt_bboxes', 'gt_labels', 'gt_poses_3d',
               'gt_labels_3d', 'centers2d', 'depths'],
         num_joints=num_joints),
]

data_root = 'data/panoptic/'
data = dict(
    train=[
        dict(
            type='CMUPanopticDataset',
            data_root=data_root,
            use_bbox_center=use_bbox_center,
            norm_depth=True,
            abs_dz=abs_dz,
            depth_factor=1,
            ann_file=data_root + 'annotations/train.json',
            img_prefix=data_root,
            pipeline=train_pipeline),
        dict(
            type='COCOKeypointsDataset',
            convert_ids='panoptic',
            use_bbox_center=use_bbox_center,
            data_root='data/coco/',
            ann_file='data/coco/annotations/person_keypoints_train2017.json',
            img_prefix='data/coco/train2017/',
            classes=('person',),
            pipeline=train_pipeline_coco,
            test_mode=False),
    ],
    test=dict(
        use_bbox_center=use_bbox_center,
        abs_dz=abs_dz,
        ann_file=data_root + 'annotations/haggling.json',
    ),
)

optimizer = dict(
    lr=2e-3,
    paramwise_cfg=dict(bias_lr_mult=2., bias_decay_mult=0.))
optimizer_config = dict(
    _delete_=True, grad_clip=dict(max_norm=35, norm_type=2))
runner = dict(type='EpochBasedRunner', max_iters=None, max_epochs=22)
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=250,
    warmup_ratio=1.0 / 3,
    step=[16, 20])
log_config = dict(interval=50)
checkpoint_config = dict(interval=1, max_keep_ckpts=20)
evaluation = dict(interval=1)
