# TPU-native training variant of exp_panoptic: the DCN tap fetch uses the
# gather-free dense-shift lowering (streaming shifted multiply-adds instead
# of random-access gathers; measured 1.6x e2e inference at radius 1,
# tools/analysis_tools/e2e_mode_bench.py). The lowering clamps every
# learned DCN offset to +-dcn_shift_radius feature px, so it is a
# *model-semantics choice* for training from scratch — NOT for loading the
# released reference checkpoint, whose offsets are unbounded (use
# exp_panoptic.py for checkpoint parity; its 'patch' gathers are exact
# DCNv2 per ref mmcv ModulatedDeformConv semantics).
_base_ = ['./exp_panoptic.py']

model = dict(
    bbox_head=dict(
        dcn_gather_mode='shift',
        # +-2 feature px covers the offset range a 3x3 modulated kernel
        # typically learns; radius 1 is ~10% faster still if the training
        # run shows offsets saturating below it
        dcn_shift_radius=2,
    ),
)
