"""Inference APIs (ref: mmdet3d/apis/inference.py:36,195 and tools/test.py).

``init_model`` builds the flax model from a config and optionally loads a
torch checkpoint through the bridge. ``make_predict_fn`` returns ONE jitted
function: backbone -> FPN -> head -> fused decode, entirely on device —
the reference's ``simple_test`` + host-side numpy NMS collapsed into a
single XLA program (per padded-resolution bucket).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.decode import decode_batch
from ..models import DAS, build_model


def init_model(config, checkpoint: Optional[str] = None,
               dtype=jnp.float32, seed: int = 0,
               input_shape: Tuple[int, int] = (64, 64),
               validate_dcn: bool = True):
    """Build model + variables; optionally load a torch .pth checkpoint.

    When the config selects a shift/hybrid DCN lowering and weights were
    loaded, the learned conv_offset fields are bounds-checked once
    (``validate_dcn_offsets``); if the checkpoint's offsets exceed the
    configured radius/budget the model is rebuilt with the exact 'patch'
    gathers and a warning is printed — a loaded-checkpoint eval can
    never silently serve approximate DCNv2.
    """
    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_model(dict(config.model), dtype=dtype)
    img = jnp.zeros((1, *input_shape, 3), jnp.float32)
    variables = model.init_all(jax.random.PRNGKey(seed), img)
    variables = dict(variables)
    if checkpoint is not None:
        from ..checkpoint.torch_bridge import load_torch_checkpoint
        variables, report = load_torch_checkpoint(variables, checkpoint)
        if report['missing']:
            print(f'[das_tpu] checkpoint missing {len(report["missing"])} '
                  'leaves (kept init values)')
        head = dict(config.model['bbox_head'])
        mode = head.get('dcn_gather_mode', 'patch')
        if validate_dcn and mode in ('shift', 'shift_pallas',
                                     'hybrid', 'hybrid_pallas'):
            radius = int(head.get('dcn_shift_radius', 2))
            budget = int(head.get('dcn_shift_budget', 2048))
            shift_ok, hybrid_ok, worst = validate_dcn_offsets(
                model, variables, radius, budget)
            ok = shift_ok if mode.startswith('shift') else hybrid_ok
            if not ok:
                print(f"[das_tpu] WARNING: checkpoint offsets exceed the "
                      f"'{mode}' lowering's exactness bound "
                      f"(radius={radius}, budget={budget}; worst layer: "
                      f"max|off|={worst[0]:.2f}, flagged/img={worst[1]}) "
                      f"— falling back to exact 'patch' gathers")
                mc = dict(config.model)
                mc['bbox_head'] = dict(head, dcn_gather_mode='patch')
                config.model = mc
                model = build_model(mc, dtype=dtype)
    return model, variables, config


def validate_dcn_offsets(model, variables, radius: int, budget: int,
                         hw: Tuple[int, int] = (256, 320),
                         batch: int = 2, seed: int = 0):
    """Bound every DCN layer's learned offsets on random-normal inputs.

    Returns (shift_ok, hybrid_ok, (worst max|off|, worst flagged/img)).
    The same check as tools/validate_hybrid.py (which prints the
    per-layer table); random inputs exercise the trained conv_offset
    weights but are a heuristic certificate — the runtime cond-gated
    repair in the 'hybrid' lowerings stays the exactness backstop for
    any single image within budget (das_tpu/ops/deform_conv.py).
    """
    from ..ops.deform_conv import deform_offset_overflow

    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randn(batch, *hw, 3), jnp.float32)

    @jax.jit
    def fwd(v, x):
        _, inter = model.apply(v, x, train=False,
                               mutable=['intermediates'])
        return inter['intermediates']

    inter = fwd(variables, img)
    worst_off, worst_flagged = 0.0, 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(inter):
        name = '/'.join(str(getattr(k, 'key', k)) for k in path)
        if 'dcn_offset' not in name:
            continue
        off = np.asarray(leaf[0] if isinstance(leaf, tuple) else leaf,
                         np.float32)
        worst_off = max(worst_off, float(np.abs(off).max()))
        worst_flagged = max(worst_flagged, int(np.asarray(
            deform_offset_overflow(jnp.asarray(off), radius,
                                   budget=0)).max()))
    return (worst_off <= radius, worst_flagged <= budget,
            (worst_off, worst_flagged))


def make_predict_fn(model: DAS, test_cfg: Dict, num_joints: int,
                    strides) -> Any:
    """Jitted end-to-end predict: images + scale_factors -> decoded poses.

    Compiles once per distinct padded image shape (resolution bucket).
    """

    @functools.partial(jax.jit, static_argnums=())
    def predict(variables, img, scale_factors):
        cls_scores, pose_preds, centernesses, _ = model.apply(
            variables, img, train=False)
        return decode_batch(cls_scores, pose_preds, centernesses,
                            strides, scale_factors, num_joints,
                            dict(test_cfg))

    return predict


def inference_detector(model: DAS, variables, cfg, image,
                       predict_fn=None) -> Dict:
    """Single-image inference (ref: apis/inference.py:195
    ``inference_mono_3d_detector``): runs the test pipeline on one image
    path or array and returns the decoded people dict."""
    import cv2

    if isinstance(image, str):
        img = cv2.imread(image, cv2.IMREAD_COLOR)
        path = image
    else:
        img = image
        path = '<array>'
    h, w = img.shape[:2]
    scale = (1333, 640)
    ratio = min(max(scale) / max(h, w), min(scale) / min(h, w))
    nh, nw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    resized = cv2.resize(img, (nw, nh),
                         interpolation=cv2.INTER_LINEAR).astype(np.float32)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    norm = (resized[..., ::-1] - mean) / std
    ph, pw = (nh + 31) // 32 * 32, (nw + 31) // 32 * 32
    padded = np.zeros((ph, pw, 3), np.float32)
    padded[:nh, :nw] = norm

    head = cfg.model.bbox_head
    if predict_fn is None:
        predict_fn = make_predict_fn(model, dict(cfg.model.test_cfg),
                                     int(head.num_joints),
                                     tuple(head.strides))
    sf = jnp.asarray([[nw / w, nh / h]], jnp.float32)
    decoded = predict_fn(variables, jnp.asarray(padded)[None], sf)
    return results_to_host(decoded, [path])[0]


def results_to_host(decoded, image_paths: List[str]) -> List[Dict]:
    """Convert fixed-shape device output into the reference's per-image
    result dicts (ref das_head.py:680-687)."""
    scores = np.asarray(decoded['scores'])
    poses = np.asarray(decoded['poses'])
    centers = np.asarray(decoded['centers'])
    vis = np.asarray(decoded['vis'])
    valid = np.asarray(decoded['valid'])
    out = []
    for i, path in enumerate(image_paths):
        m = valid[i]
        out.append(dict(
            poses=poses[i][m],
            vis=vis[i][m],
            centers=centers[i][m],
            image_paths=[path],
            scores=scores[i][m].tolist()))
    return out
