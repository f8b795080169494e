# Base DAS model (ref recipe: /root/reference/configs/_base_/models/das.py).
# The DAS experiments replace the backbone/neck wholesale; only the head
# sub-config here carries shared defaults.
model = dict(
    type='DAS',
    backbone=dict(type='MSPN2'),
    neck=dict(type='FPN'),
    bbox_head=dict(
        type='DASHead',
        num_classes=1,
        in_channels=256,
        stacked_convs=2,
        feat_channels=256,
        strides=[8, 16, 32, 64],
        center_sample_radius=1.5,
        num_joints=15,
        cls_branch=(256,),
        reg_branch=(
            (256,),
            (256,),
            (256,),
            (256,),
        ),
        centerness_on_reg=True,
        conv_bias=True,
        dcn_on_last_conv=True,
        recursive_update=dict(
            prev_loss=True,
            num_heads=4,
            in_channels=256,
            feat_channels=256,
            num_layers=1,
            dim=3,
        ),
    ),
)
