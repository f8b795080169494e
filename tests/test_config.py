"""Config system semantics (mmcv Config surface: _base_/_delete_/
--cfg-options incl. list-index overrides)."""

import pytest

from das_tpu.config import Config


def test_merge_from_dict_nested():
    cfg = Config(dict(a=dict(b=1, c=2), d=3))
    cfg.merge_from_dict({'a.b': 10, 'd': 30})
    assert cfg.a.b == 10 and cfg.a.c == 2 and cfg.d == 30


def test_merge_from_dict_list_index():
    cfg = Config(dict(data=dict(pipeline=[
        dict(type='Load'), dict(type='Aug', flip=False)])))
    cfg.merge_from_dict({'data.pipeline.1.flip': True})
    assert cfg.data['pipeline'][1]['flip'] is True
    assert cfg.data['pipeline'][0] == dict(type='Load')


def test_merge_from_dict_list_index_out_of_range():
    cfg = Config(dict(pipeline=[dict(type='Load')]))
    with pytest.raises(KeyError):
        cfg.merge_from_dict({'pipeline.7.x': 1})


def test_base_composition_and_delete():
    cfg = Config.fromfile('configs/das/exp_panoptic.py')
    # _delete_ replaced the base backbone subtree (exp config wins)
    assert cfg.model.type == 'DAS'
    assert cfg.model.bbox_head.num_joints == 15
    # cfg-options list override reaches the real test pipeline
    cfg.merge_from_dict({'data.test.pipeline.2.flip': True})
    assert cfg.data['test']['pipeline'][2]['flip'] is True
