"""String-typed component registries.

Preserves the OpenMMLab-style registry API the reference exposes
(ref: mmdet3d/models/builder.py:75, mmdet3d/datasets/builder.py:20-43,
``@DETECTORS.register_module()`` at detectors/das.py:5) so configs that say
``dict(type='DASHead', ...)`` keep working on the TPU framework.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._module_dict: Dict[str, Callable] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> Dict[str, Callable]:
        return self._module_dict

    def get(self, key: str) -> Optional[Callable]:
        return self._module_dict.get(key)

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self):
        return f'Registry(name={self._name}, items={list(self._module_dict)})'

    def register_module(self, name: str = None, module: Callable = None,
                        force: bool = False):
        """Use as decorator ``@REG.register_module()`` or direct call."""
        if module is not None:
            self._register(module, name, force)
            return module

        def _decorator(cls):
            self._register(cls, name, force)
            return cls

        return _decorator

    def _register(self, module: Callable, name: Optional[str], force: bool):
        key = name or module.__name__
        if not force and key in self._module_dict:
            raise KeyError(f'{key} is already registered in {self._name}')
        self._module_dict[key] = module

    def build(self, cfg: Dict, **default_args: Any):
        return build_from_cfg(cfg, self, **default_args)


def build_from_cfg(cfg: Dict, registry: Registry, **default_args: Any):
    """Instantiate ``registry[cfg['type']](**cfg_without_type)``."""
    if cfg is None:
        return None
    if not isinstance(cfg, dict) or 'type' not in cfg:
        raise TypeError(f'cfg must be a dict with a "type" key, got {cfg!r}')
    args = dict(cfg)
    obj_type = args.pop('type')
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f'{obj_type} is not in the {registry.name} '
                           f'registry; known: {sorted(registry.module_dict)}')
    elif inspect.isclass(obj_type) or inspect.isfunction(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f'type must be a str or class, got {type(obj_type)}')
    for k, v in default_args.items():
        args.setdefault(k, v)
    return obj_cls(**args)


# Global registries mirroring the reference's set.
MODELS = Registry('models')          # detectors
BACKBONES = Registry('backbones')
NECKS = Registry('necks')
HEADS = Registry('heads')
LOSSES = Registry('losses')
DATASETS = Registry('datasets')
PIPELINES = Registry('pipelines')
EVALUATORS = Registry('evaluators')
