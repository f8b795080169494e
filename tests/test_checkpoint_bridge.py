"""Checkpoint-bridge coverage test.

Synthesises the exact torch ``state_dict`` key set the reference DAS model
emits (derived from the module structure in
/root/reference/mmdet3d/models/ — MSPN2 backbone, mmdet FPN, DASHead with
recursive update + RealNVP flows) and asserts the bridge maps it onto the
das_tpu flax tree with zero missing and zero unexpected leaves.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from das_tpu.config import Config
from das_tpu.models import build_model
from das_tpu.checkpoint.torch_bridge import (convert_state_dict,
                                             merge_into_variables)

BN_KEYS = ['weight', 'bias', 'running_mean', 'running_var',
           'num_batches_tracked']
GN_KEYS = ['weight', 'bias']


def conv_shape(cin, cout, k):
    return (cout, cin, k, k)


def reference_torch_keys(num_stages=2, num_blocks=(3, 4, 6, 3), J=15,
                         stacked=2, ru_layers=1, ru_heads=4):
    """Enumerate (key -> shape) of the reference DAS state_dict."""
    keys = {}

    def add_bn(prefix, c):
        for k in BN_KEYS:
            keys[f'{prefix}.{k}'] = () if k == 'num_batches_tracked' else (c,)

    def add_gn(prefix, c):
        for k in GN_KEYS:
            keys[f'{prefix}.{k}'] = (c,)

    def add_convmodule(prefix, cin, cout, k, norm='bn', bias=False,
                       dcn=False):
        keys[f'{prefix}.conv.weight'] = conv_shape(cin, cout, k)
        if bias:
            keys[f'{prefix}.conv.bias'] = (cout,)
        if dcn:
            keys[f'{prefix}.conv.conv_offset.weight'] = conv_shape(cin, 27, k)
            keys[f'{prefix}.conv.conv_offset.bias'] = (27,)
        if norm == 'bn':
            add_bn(f'{prefix}.bn', cout)
        elif norm == 'gn':
            add_gn(f'{prefix}.gn', cout)

    # ---- backbone.top (ResNetTop, mspn_mmpose.py:533-556)
    add_convmodule('backbone.top.top.0', 3, 64, 7)

    # ---- backbone stages
    for s in range(num_stages):
        base = f'backbone.multi_stage_mspn.{s}'
        in_ch = 64
        for u in range(4):
            mid = 64 * (2 ** u)
            for b in range(num_blocks[u]):
                p = f'{base}.downsample.layer{u + 1}.{b}'
                cin = in_ch if b == 0 else mid * 4
                keys[f'{p}.conv1.weight'] = conv_shape(cin, mid, 1)
                add_bn(f'{p}.bn1', mid)
                keys[f'{p}.conv2.weight'] = conv_shape(mid, mid, 3)
                add_bn(f'{p}.bn2', mid)
                keys[f'{p}.conv3.weight'] = conv_shape(mid, mid * 4, 1)
                add_bn(f'{p}.bn3', mid * 4)
                if b == 0:
                    add_convmodule(f'{p}.downsample', cin, mid * 4, 1)
            in_ch = mid * 4
        up_in = [2048, 1024, 512, 256]
        gen_skip = s != num_stages - 1
        for u in range(4):
            p = f'{base}.upsample.up{u + 1}'
            add_convmodule(f'{p}.in_skip', up_in[u], 256, 1)
            if u > 0:
                add_convmodule(f'{p}.up_conv', 256, 256, 1)
            if gen_skip:
                add_convmodule(f'{p}.out_skip1', up_in[u], up_in[u], 1)
                add_convmodule(f'{p}.out_skip2', 256, up_in[u], 1)
            if u == 3 and gen_skip:
                add_convmodule(f'{p}.cross_conv', 256, 64, 1)

    # ---- neck (mmdet FPN)
    for i in range(4):
        add_convmodule(f'neck.lateral_convs.{i}', 256, 256, 1)
        add_convmodule(f'neck.fpn_convs.{i}', 256, 256, 3)

    # ---- head towers (anchor_free_mono3d_pose_head.py:106-144,
    #      das_head.py:103-174)
    for tower in ['cls_convs', 'reg_convs', 'pose_convs']:
        for i in range(stacked):
            dcn = i == stacked - 1
            add_convmodule(f'bbox_head.{tower}.{i}', 256, 256, 3,
                           norm='gn', bias=True, dcn=dcn)
    add_convmodule('bbox_head.conv_cls_prev.0', 256, 256, 3, norm='gn',
                   bias=True)
    keys['bbox_head.conv_cls.weight'] = conv_shape(256, 1, 1)
    keys['bbox_head.conv_cls.bias'] = (1,)
    group_dims = [2, 1, 3 * J, 3 * J]
    for i in range(2):
        add_convmodule(f'bbox_head.conv_reg_prevs.{i}.0', 256, 256, 3,
                       norm='gn', bias=True)
        keys[f'bbox_head.conv_regs.{i}.weight'] = \
            conv_shape(256, group_dims[i], 1)
        keys[f'bbox_head.conv_regs.{i}.bias'] = (group_dims[i],)
    for i in range(2):
        add_convmodule(f'bbox_head.conv_pose_prevs.{i}.0', 256, 256, 3,
                       norm='gn', bias=True)
        keys[f'bbox_head.conv_poses.{i}.weight'] = \
            conv_shape(256, group_dims[i + 2], 1)
        keys[f'bbox_head.conv_poses.{i}.bias'] = (group_dims[i + 2],)
    add_convmodule('bbox_head.conv_centerness_prev.0', 256, 64, 3,
                   norm='gn', bias=True)
    keys['bbox_head.conv_centerness.weight'] = conv_shape(64, 1, 1)
    keys['bbox_head.conv_centerness.bias'] = (1,)
    for lvl in range(4):
        for g in range(4):
            keys[f'bbox_head.scales.{lvl}.{g}.scale'] = ()

    # ---- recursive update branch (recursive_update.py:164-255)
    add_convmodule('bbox_head.recursive_update_branch.reduction',
                   256, 256, 1, norm='gn')
    for li in range(ru_layers):
        p = f'bbox_head.recursive_update_branch.layer_{li}.next_level_offset'
        add_convmodule(f'{p}.update_feat_conv', 256, 256, 3, norm='gn',
                       dcn=True)
        keys[f'{p}.sampling_offset.weight'] = \
            conv_shape(256, J * ru_heads * 2, 1)
        keys[f'{p}.sampling_offset.bias'] = (J * ru_heads * 2,)
        keys[f'{p}.sampling_conf.weight'] = conv_shape(256, J * 3, 1)
        keys[f'{p}.sampling_conf.bias'] = (J * 3,)
        keys[f'{p}.update_weight.weight'] = conv_shape(256, J * 3, 1)
        keys[f'{p}.update_weight.bias'] = (J * 3,)
        keys[f'{p}.update_offset_value.weight'] = conv_shape(256, J * 3, 1)
        keys[f'{p}.update_offset_value.bias'] = (J * 3,)

    # ---- RealNVP flows (real_nvp.py:29-101)
    for flow, dim in [('flow3d', 3), ('flow2d', 2),
                      ('flow3d_update', 3), ('flow2d_update', 2)]:
        keys[f'bbox_head.{flow}.mask'] = (6, dim)
        for st in 'st':
            for i in range(6):
                dims = [(dim, 64), (64, 64), (64, dim)]
                for j, (a, b) in zip((0, 2, 4), dims):
                    keys[f'bbox_head.{flow}.{st}.{i}.{j}.weight'] = (b, a)
                    keys[f'bbox_head.{flow}.{st}.{i}.{j}.bias'] = (b,)
    return keys


@pytest.fixture(scope='module')
def panoptic_variables():
    cfg = Config.fromfile('configs/das/exp_panoptic.py')
    model = build_model(dict(cfg.model))
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return jax.eval_shape(
        lambda: model.init_all(jax.random.PRNGKey(0), img))


def test_bridge_full_coverage(panoptic_variables):
    key_shapes = reference_torch_keys()
    rng = np.random.RandomState(0)
    sd = {k: np.asarray(rng.randn(*s), np.float32)
          for k, s in key_shapes.items()}
    params, stats, dropped = convert_state_dict(sd)
    new_vars, report = merge_into_variables(
        dict(panoptic_variables), params, stats, strict=False)
    assert report['unexpected'] == [], report['unexpected'][:10]
    assert report['missing'] == [], report['missing'][:10]

    # spot-check a conv transpose: torch (O,I,kh,kw) -> flax (kh,kw,I,O)
    t = sd['backbone.top.top.0.conv.weight']
    f = np.asarray(
        new_vars['params']['backbone']['top']['top_conv']['conv']['kernel'])
    np.testing.assert_allclose(f, t.transpose(2, 3, 1, 0))

    # and a linear transpose in the flows
    t = sd['bbox_head.flow3d.s.0.0.weight']
    f = np.asarray(
        new_vars['params']['bbox_head']['flow3d']['s_0_0']['kernel'])
    np.testing.assert_allclose(f, t.transpose(1, 0))

    # BN stats land in batch_stats
    t = sd['backbone.top.top.0.bn.running_mean']
    f = np.asarray(
        new_vars['batch_stats']['backbone']['top']['top_conv']['bn']['mean'])
    np.testing.assert_allclose(f, t)


def test_pth_file_roundtrip_full_tree(panoptic_variables, tmp_path):
    """Full exp_panoptic key space through the REAL .pth file path:
    synthesize a torch checkpoint with the exact reference key set,
    torch.save it, load via load_torch_checkpoint(strict=True) — zero
    missing / zero unexpected — export back with save_torch_checkpoint
    and assert key-set + shape + bit identity. One command stands between
    real-asset delivery and the MPJPE verdict; this proves the bridge on
    the full key space, not a toy tree."""
    import torch
    from das_tpu.checkpoint.torch_bridge import (load_torch_checkpoint,
                                                 read_state_dict,
                                                 save_torch_checkpoint)

    key_shapes = reference_torch_keys()
    rng = np.random.RandomState(2)
    sd0 = {k: np.asarray(rng.randn(*s), np.float32)
           for k, s in key_shapes.items()}
    sd0_t = {k: torch.from_numpy(v.copy()) for k, v in sd0.items()}
    src = str(tmp_path / 'synthetic_exp_panoptic.pth')
    torch.save(dict(state_dict=sd0_t, meta=dict(synthetic=True)), src)

    # materialise the full-size variable tree with real zeros (eval_shape
    # leaves are structs; strict load only needs shapes/dtypes, but the
    # export needs arrays)
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), dict(panoptic_variables))
    loaded, report = load_torch_checkpoint(variables, src, strict=True)
    assert report['missing'] == [] and report['unexpected'] == []

    dst = str(tmp_path / 'roundtrip.pth')
    save_torch_checkpoint(loaded, dst, meta=dict(synthetic=True))
    sd1 = read_state_dict(dst)

    dropped = {k for k in sd0
               if k.endswith('num_batches_tracked') or k.endswith('.mask')}
    assert set(sd1) == set(sd0) - dropped, (
        sorted(set(sd0) - dropped - set(sd1))[:8],
        sorted(set(sd1) - set(sd0))[:8])
    for k, v in sd1.items():
        assert v.shape == sd0[k].shape, k
        np.testing.assert_array_equal(v, sd0[k], err_msg=k)


def test_export_roundtrip(panoptic_variables):
    """flax -> torch export -> bridge import must reproduce the tree."""
    from das_tpu.checkpoint.torch_bridge import export_torch_state_dict

    # materialise with real values (eval_shape gives ShapeDtypeStructs)
    key_shapes = reference_torch_keys()
    rng = np.random.RandomState(1)
    sd0 = {k: np.asarray(rng.randn(*s), np.float32)
           for k, s in key_shapes.items()}
    params, stats, _ = convert_state_dict(sd0)
    variables, _ = merge_into_variables(
        dict(panoptic_variables), params, stats, strict=False)

    sd1 = export_torch_state_dict(variables)
    # every original key except dropped buffers must round-trip exactly
    missing = [k for k in sd0
               if k not in sd1 and not k.endswith('num_batches_tracked')
               and not k.endswith('.mask')]
    assert missing == [], missing[:8]
    for k, v in sd1.items():
        if k in sd0:
            np.testing.assert_allclose(v, sd0[k], err_msg=k)


def test_init_model_dcn_validation_fallback(tmp_path):
    """init_model with a shift/hybrid DCN mode must bounds-check a loaded
    checkpoint's offsets and fall back to exact 'patch' gathers when the
    learned offsets exceed the lowering's exactness budget."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from das_tpu.config import Config
    from das_tpu.apis.inference import init_model, validate_dcn_offsets
    from das_tpu.checkpoint.torch_bridge import save_torch_checkpoint
    from das_tpu.models import build_model
    from test_model import TINY_MODEL

    mc = dict(TINY_MODEL)
    mc['bbox_head'] = dict(mc['bbox_head'], dcn_gather_mode='hybrid',
                           dcn_shift_radius=1, dcn_shift_budget=4)
    model = build_model(mc)
    variables = dict(model.init_all(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3))))

    # doctor every conv_offset bias so offsets blow past the radius at
    # (almost) every pixel -> way beyond the 4-px budget
    def blow(tree):
        for k, v in tree.items():
            if k == 'conv_offset':
                v['bias'] = jnp.full_like(v['bias'], 7.0)
            elif isinstance(v, dict):
                blow(v)
    blow(variables['params'])
    path = str(tmp_path / 'doctored.pth')
    save_torch_checkpoint(variables, path)

    s_ok, h_ok, worst = validate_dcn_offsets(model, variables, radius=1,
                                             budget=4, hw=(64, 64),
                                             batch=1)
    assert not s_ok and not h_ok and worst[0] >= 7.0

    cfg = Config(dict(model=mc))
    model2, vars2, cfg2 = init_model(cfg, checkpoint=path,
                                     input_shape=(64, 64))
    assert cfg2.model['bbox_head']['dcn_gather_mode'] == 'patch'
    assert model2.bbox_head['dcn_gather_mode'] == 'patch'

    # a clean checkpoint (zero-init offsets) keeps the configured mode
    variables2 = dict(model.init_all(jax.random.PRNGKey(1),
                                     jnp.zeros((1, 64, 64, 3))))
    path2 = str(tmp_path / 'clean.pth')
    save_torch_checkpoint(variables2, path2)
    cfg = Config(dict(model=mc))
    _, _, cfg3 = init_model(cfg, checkpoint=path2, input_shape=(64, 64))
    assert cfg3.model['bbox_head']['dcn_gather_mode'] == 'hybrid'
