"""DAS detector: backbone + FPN + DASHead composition (TPU/flax).

Rebuilds the reference detector stack
(ref: mmdet3d/models/detectors/das.py:6-39,
single_stage_mono3d.py / base.py dispatch): ``extract_feat`` ->
head forward; train returns per-level outputs for the loss, test feeds the
fused decode.

Built from an mmdet3d-style model config via ``build_model`` so the
reference configs keep working (ref: mmdet3d/models/builder.py:75).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import wrap_cfg
from ..config.registry import BACKBONES, HEADS, MODELS, NECKS, build_from_cfg

Dtype = Any


@MODELS.register_module()
class DAS(nn.Module):
    """Single-stage multi-person 3D pose detector."""
    backbone: dict
    neck: dict
    bbox_head: dict
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        common = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.backbone_mod = build_from_cfg(
            _clean(self.backbone), BACKBONES, name='backbone', **common)
        self.neck_mod = build_from_cfg(
            _clean(self.neck), NECKS, name='neck', **common)
        head_cfg = _clean(self.bbox_head)
        head_cfg.setdefault('train_cfg', self.train_cfg)
        head_cfg.setdefault('test_cfg', self.test_cfg)
        self.head_mod = build_from_cfg(
            head_cfg, HEADS, name='bbox_head', **common)

    def extract_feat(self, img: jnp.ndarray, train: bool = False):
        x = self.backbone_mod(img, train)
        return self.neck_mod(x, train)

    def __call__(self, img: jnp.ndarray, train: bool = False,
                 select_idx=None):
        """Forward to per-level head outputs.

        Returns (cls_scores, pose_preds, centernesses, ref_uvds), each a
        list over levels of NHWC tensors. ``select_idx`` (optional list of
        per-level (N, K) flat spatial indices) restricts the recursive-
        update re-sampling to those points (see DASHead.forward_single).
        """
        feats = self.extract_feat(img, train)
        return self.head_mod(feats, train, select_idx)

    def loss(self, img: jnp.ndarray, targets: Dict[str, jnp.ndarray],
             max_pos: int = 1024) -> Dict[str, jnp.ndarray]:
        """Training forward + loss (ref das.py:17-32).

        With ``train_cfg.sparse_refine`` the recursive-update re-sampling
        runs only at the assigned positive points: the loss gathers at
        most ``max_pos`` positives (flat-order prefix, see
        ``DASHead.loss``), each level's first-``max_pos`` positives are a
        superset of that prefix's per-level slice, and the refined value
        at a point depends only on that point — so losses and gradients
        are bitwise those of the dense computation.
        """
        select = None
        if dict(self.train_cfg or {}).get('sparse_refine'):
            import jax
            labels = targets['labels']
            N = img.shape[0]
            n_levels = len(self.bbox_head.get('strides', (8, 16, 32, 64)))
            bg = self.head_mod.bg_label
            select, begin = [], 0
            for i in range(n_levels):
                n = (img.shape[1] // (4 * 2 ** i)) * \
                    (img.shape[2] // (4 * 2 ** i))
                lab = labels[begin:begin + N * n].reshape(N, n)
                begin += N * n
                if n <= max_pos:
                    select.append(None)      # sparse would cover all points
                    continue
                pos = jnp.where(lab < bg, 1.0, 0.0)
                _, idx = jax.lax.top_k(pos, max_pos)
                select.append(idx)
        cls_scores, pose_preds, centernesses, ref_uvds = self(
            img, train=True, select_idx=select)
        return self.head_mod.loss(cls_scores, pose_preds, centernesses,
                                  ref_uvds, targets, max_pos=max_pos)

    def init_all(self, rng, img: jnp.ndarray):
        """Create every parameter, including the loss-only RealNVP flows.

        ``init`` on the plain forward never traces the flows; this helper
        runs the loss path on dummy targets so the full tree exists for
        checkpoint loading and training.

        Flax ``init`` executes eagerly, op by op.  On a remote accelerator
        backend that is thousands of ~latency-bound dispatches, so when the
        default device is not the host CPU the init runs on the CPU backend
        and the finished tree is moved across in one bulk transfer.
        """
        import jax

        J = self.bbox_head['num_joints']
        # token targets: shapes follow das_tpu.core.targets.get_targets
        n_levels = len(self.bbox_head.get('strides', (8, 16, 32, 64)))
        n_pts = sum((img.shape[1] // (4 * 2 ** i)) *
                    (img.shape[2] // (4 * 2 ** i)) for i in range(n_levels))
        T = img.shape[0] * n_pts

        def make_and_init(img):
            targets = dict(
                labels=jnp.ones((T,), jnp.int32),
                pose_targets=jnp.zeros((T, 3 + 4 * J), jnp.float32),
                centerness_targets=jnp.zeros((T,), jnp.float32),
                strides=jnp.ones((T,), jnp.float32))
            return self.init(rng, img, targets, method=DAS.loss)

        default = jax.devices()[0]
        if default.platform == 'cpu':
            return make_and_init(img)
        try:
            cpu = jax.devices('cpu')[0]
        except RuntimeError:
            return make_and_init(img)
        with jax.default_device(cpu):
            variables = make_and_init(jax.device_put(img, cpu))
        return jax.device_put(variables, default)


def _clean(cfg) -> dict:
    """Copy a component config, dropping keys the flax modules don't take."""
    cfg = dict(cfg)
    cfg.pop('pretrained', None)
    return cfg


def build_model(cfg: dict, dtype=jnp.float32, axis_name=None) -> DAS:
    """mmdet3d-style entry: ``build_model(cfg.model)``."""
    cfg = dict(wrap_cfg(cfg))
    return build_from_cfg(cfg, MODELS, dtype=dtype, axis_name=axis_name)
