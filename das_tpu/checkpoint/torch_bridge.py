"""torch ``.pth`` checkpoint -> flax variable-tree bridge.

The north star requires reading the released PyTorch DAS checkpoints
bit-for-bit (SURVEY.md §5 "Checkpoint / resume"). This module maps mmcv/torch
``state_dict`` keys onto the das_tpu flax tree:

* layout transposes: conv (O,I,kh,kw) -> (kh,kw,I,O); linear (O,I) -> (I,O)
* BatchNorm: weight/bias -> params scale/bias;
  running_mean/var -> batch_stats mean/var; num_batches_tracked dropped
* naming: torch module paths translate 1:1 to flax collection paths
  (list indices ``.0.`` become flax auto-names ``_0``), with a few
  structural renames (``multi_stage_mspn.{s}`` -> ``stage{s}``,
  MSPN bottleneck ``bnK`` folding into ``convK/bn``, the ResNetTop
  sequential, and RealNVP sequential indices 0/2/4 -> 0/1/2).

It also reimplements the reference's pretrained-backbone remapping
(ref: mmdet3d/models/backbones/mspn_mmpose.py:669-722): ``backbone.``-prefix
stripping for the MSPN CoCo checkpoints.

``load_torch_checkpoint`` is strict by default: it reports unconsumed torch
keys and unfilled flax leaves so silent partial loads cannot happen.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def read_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy arrays (host-only, needs torch)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if hasattr(v, 'numpy'):
            out[k] = v.detach().cpu().numpy()
    return out


def strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """mmcv get_state_dict prefix stripping (ref mspn_mmpose.py:161-193)."""
    out = {}
    for k, v in sd.items():
        if k.startswith('module.backbone.'):
            out[k[len('module.backbone.'):]] = v
        elif k.startswith('module.'):
            out[k[len('module.'):]] = v
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------- mapping

def _flax_path_for(torch_key: str) -> Tuple[Tuple[str, ...], str, str]:
    """Map a torch state_dict key to (flax_path, collection, kind).

    kind in {conv_w, linear_w, scalar, plain, bn_stat, drop}.
    Returns collection 'params' or 'batch_stats'.
    """
    k = torch_key
    if k.endswith('num_batches_tracked') or k.endswith('.mask'):
        return (), '', 'drop'

    # structural renames --------------------------------------------------
    k = re.sub(r'^backbone\.multi_stage_mspn\.(\d+)\.', r'backbone.stage\1.',
               k)
    k = k.replace('backbone.top.top.0.', 'backbone.top.top_conv.')
    # MSPN downsample bottlenecks: layer{u}.{b} -> layer{u}_{b}
    k = re.sub(r'downsample\.layer(\d+)\.(\d+)\.', r'downsample.layer\1_\2.',
               k)
    # bottleneck separate norms bnK -> convK.bn; convK weights -> convK.conv
    k = re.sub(r'\.bn([123])\.', r'.conv\1.bn.', k)
    k = re.sub(r'\.conv([123])\.weight$', r'.conv\1.conv.weight', k)
    # RealNVP sequential: s.{i}.{j} with j in 0/2/4 -> s_{i}_{j//2}
    m = re.match(r'^(bbox_head\.flow(?:3d|2d)(?:_update)?)\.([st])\.(\d+)'
                 r'\.(\d+)\.(.*)$', k)
    if m:
        base, st, i, j, rest = m.groups()
        k = f'{base}.{st}_{i}_{int(j) // 2}.{rest}'

    # generic list-index flattening: '.<name>.<idx>.' -> '.<name>_<idx>.'
    prev = None
    while prev != k:
        prev = k
        k = re.sub(r'\.(\d+)\.', r'_\1.', k, count=1)

    parts = k.split('.')
    leaf = parts[-1]
    path = parts[:-1]

    # norm layers ---------------------------------------------------------
    if len(path) >= 1 and path[-1] in ('bn', 'gn'):
        if leaf == 'weight':
            return tuple(path + ['scale']), 'params', 'plain'
        if leaf == 'bias':
            return tuple(path + ['bias']), 'params', 'plain'
        if leaf == 'running_mean':
            return tuple(path + ['mean']), 'batch_stats', 'bn_stat'
        if leaf == 'running_var':
            return tuple(path + ['var']), 'batch_stats', 'bn_stat'

    # scale modules -------------------------------------------------------
    if leaf == 'scale':
        return tuple(path + ['scale']), 'params', 'scalar'

    if leaf == 'weight':
        return tuple(path + ['kernel']), 'params', 'auto_w'
    if leaf == 'bias':
        return tuple(path + ['bias']), 'params', 'plain'
    raise KeyError(f'unmapped torch key: {torch_key} (normalised {k})')


def convert_state_dict(sd: Dict[str, np.ndarray]
                       ) -> Tuple[Dict[str, Any], Dict[str, Any], List[str]]:
    """Convert a torch state_dict into nested params / batch_stats dicts."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    dropped: List[str] = []

    def insert(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for tk, v in sd.items():
        path, coll, kind = _flax_path_for(tk)
        if kind == 'drop':
            dropped.append(tk)
            continue
        arr = np.asarray(v)
        if kind == 'auto_w':
            if arr.ndim == 4:            # conv OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:          # linear OI -> IO
                arr = arr.transpose(1, 0)
        elif kind == 'scalar':
            arr = np.asarray(arr).reshape(())
        insert(params if coll == 'params' else stats, path, arr)
    return params, stats, dropped


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def merge_into_variables(variables: Dict[str, Any],
                         params: Dict[str, Any],
                         stats: Dict[str, Any],
                         strict: bool = True,
                         allow_missing_prefixes: Tuple[str, ...] = ()
                         ) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Fill a flax variable tree with converted torch arrays.

    Returns (new_variables, report) where report lists 'unexpected'
    (torch-side keys with no flax slot) and 'missing' (flax leaves not
    covered by the checkpoint).
    """
    import jax

    flat_vars = {('params',) + k: v
                 for k, v in _flatten(variables.get('params', {})).items()}
    flat_vars.update({('batch_stats',) + k: v for k, v in _flatten(
        variables.get('batch_stats', {})).items()})

    flat_new = {('params',) + k: v for k, v in _flatten(params).items()}
    flat_new.update({('batch_stats',) + k: v
                     for k, v in _flatten(stats).items()})

    unexpected = [k for k in flat_new if k not in flat_vars]
    missing = [k for k in flat_vars if k not in flat_new
               and not any('/'.join(k).startswith(p)
                           for p in allow_missing_prefixes)]
    if strict and (unexpected or missing):
        msg = ''
        if unexpected:
            msg += f'unexpected ({len(unexpected)}): ' + \
                ', '.join('/'.join(k) for k in unexpected[:8]) + '...\n'
        if missing:
            msg += f'missing ({len(missing)}): ' + \
                ', '.join('/'.join(k) for k in missing[:8]) + '...'
        raise ValueError('checkpoint/model tree mismatch:\n' + msg)

    out = dict(flat_vars)
    for k, v in flat_new.items():
        if k in flat_vars:
            ref = flat_vars[k]
            if tuple(ref.shape) != tuple(v.shape):
                raise ValueError(
                    f'shape mismatch at {"/".join(k)}: '
                    f'ckpt {v.shape} vs model {ref.shape}')
            out[k] = v.astype(getattr(ref, 'dtype', np.float32))

    # unflatten (leave untouched leaves — e.g. ShapeDtypeStructs — as-is)
    new_vars: Dict[str, Any] = {}
    for k, v in out.items():
        node = new_vars
        for p in k[:-1]:
            node = node.setdefault(p, {})
        node[k[-1]] = jax.numpy.asarray(v) if isinstance(v, np.ndarray) else v
    report = dict(unexpected=['/'.join(k) for k in unexpected],
                  missing=['/'.join(k) for k in missing])
    return new_vars, report


def load_torch_checkpoint(variables: Dict[str, Any], path: str,
                          strict: bool = True,
                          allow_missing_prefixes: Tuple[str, ...] = ()):
    """Full pipeline: read .pth -> convert -> merge into flax variables."""
    sd = strip_prefixes(read_state_dict(path))
    params, stats, _ = convert_state_dict(sd)
    return merge_into_variables(variables, params, stats, strict=strict,
                                allow_missing_prefixes=allow_missing_prefixes)


def export_torch_state_dict(variables: Dict[str, Any]
                            ) -> Dict[str, np.ndarray]:
    """Inverse bridge: flax variable tree -> torch-layout state_dict.

    Produces the reference's key naming and tensor layouts so weights
    trained here load into the torch reference (or round-trip through
    ``load_torch_checkpoint``). RealNVP masks (constant buffers) are
    re-emitted since torch checkpoints carry them.
    """
    flat_p = _flatten(variables.get('params', {}))
    flat_s = _flatten(variables.get('batch_stats', {}))

    def to_torch_key(path, leaf):
        name = '.'.join(path)
        # flax auto-names: '<attr>_<i>' -> '<attr>.<i>', to fixpoint so
        # nested list indices ('conv_reg_prevs_0_0') all convert
        prev = None
        while prev != name:
            prev = name
            name = re.sub(r'_(\d+)(?=[._]|$)', r'.\1', name, count=1)
        # structural renames (inverse of _flax_path_for)
        name = re.sub(r'^backbone\.stage(\d+)\.',
                      r'backbone.multi_stage_mspn.\1.', name)
        name = name.replace('.top.top_conv.', '.top.top.0.')
        # recursive-update layers are torch-named 'layer_%d'
        name = re.sub(r'recursive_update_branch\.layer\.(\d+)\.',
                      r'recursive_update_branch.layer_\1.', name)
        # bottleneck convK.conv/bn -> convK/bnK (not the ConvModule convs)
        name = re.sub(r'\.conv([123])\.bn\.', r'.bn\1.', name)
        name = re.sub(r'\.conv([123])\.conv\.', r'.conv\1.', name)
        # flow sequential indices j -> 2j
        m = re.match(r'^(bbox_head\.flow(?:3d|2d)(?:_update)?)'
                     r'\.([st])\.(\d+)\.(\d+)\.(.*)$', name)
        if m:
            base, st, i, j, rest = m.groups()
            name = f'{base}.{st}.{i}.{int(j) * 2}.{rest}'
        return name

    out: Dict[str, np.ndarray] = {}
    for path, leaf in flat_p.items():
        name = to_torch_key(path, leaf)
        arr = np.asarray(leaf)
        if path[-1] == 'kernel':
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)       # HWIO -> OIHW
                name = name[:-len('kernel')] + 'weight'
            elif arr.ndim == 2:
                arr = arr.transpose(1, 0)
                name = name[:-len('kernel')] + 'weight'
        elif path[-1] == 'scale' and arr.ndim == 1:
            # norm gamma
            name = name[:-len('scale')] + 'weight'
        out[name] = arr
    for path, leaf in flat_s.items():
        name = to_torch_key(path, leaf)
        arr = np.asarray(leaf)
        if path[-1] == 'mean':
            name = name[:-len('mean')] + 'running_mean'
        elif path[-1] == 'var':
            name = name[:-len('var')] + 'running_var'
        out[name] = arr
    return out


def save_torch_checkpoint(variables: Dict[str, Any], path: str,
                          meta: Dict = None):
    """Write a torch-loadable .pth with the reference layout."""
    import torch
    # np.ascontiguousarray promotes 0-dim scalars to shape (1,) — reshape
    # back so Scale params round-trip at the reference's () shape
    sd = {k: torch.from_numpy(
        np.ascontiguousarray(v)).reshape(np.shape(v))
        for k, v in export_torch_state_dict(variables).items()}
    torch.save(dict(state_dict=sd, meta=meta or {}), path)


def load_mspn_pretrained(variables: Dict[str, Any], path: str):
    """Load an MSPN COCO pretrained backbone into ``backbone/``
    (ref mspn_mmpose.py:669-680: strip 'backbone.' prefix, non-strict)."""
    sd = strip_prefixes(read_state_dict(path))
    sd = {k[len('backbone.'):]: v
          for k, v in sd.items() if k.startswith('backbone.')}
    sd = {'backbone.' + k: v for k, v in sd.items()}
    params, stats, _ = convert_state_dict(sd)
    return merge_into_variables(
        variables, params, stats, strict=False)
