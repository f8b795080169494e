"""das_tpu — TPU-native multi-person 3D pose estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capability of wangzt-halo/das
(DAS, CVPR 2022): MSPN backbone + FPN + distribution-aware single-stage
pose head, fused multi-person decode, mmdet3d-style config/registry,
torch-checkpoint loading, MPJPE / 3DPCK evaluators, and data-parallel
training over a `jax.sharding.Mesh`.
"""

__version__ = '0.1.0'

from .config import Config, ConfigDict
from .config.registry import (BACKBONES, DATASETS, HEADS, LOSSES, MODELS,
                              NECKS, PIPELINES)

__all__ = ['Config', 'ConfigDict', 'MODELS', 'BACKBONES', 'NECKS', 'HEADS',
           'LOSSES', 'DATASETS', 'PIPELINES', '__version__']
