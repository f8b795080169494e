"""Data-parallel training step (jit + jax.sharding SPMD).

TPU-native replacement for the reference's distributed-training stack
(SURVEY.md §2.2): torch.distributed.launch + NCCL DDP + mmcv
Fp16OptimizerHook become ONE jitted SPMD program over a
``jax.sharding.Mesh``:

* the batch is sharded over the ``data`` mesh axis; because the loss is a
  global scalar, XLA inserts the gradient all-reduce itself (no DDP),
* BatchNorm moments are global-batch means under SPMD semantics — that IS
  SyncBN, no dedicated op needed (replaces mmcv SyncBN + NaiveSyncBN,
  ref ops/norm.py),
* bf16 compute with fp32 params/loss replaces fp16 + dynamic loss scaling
  (ref exp_panoptic.py:222) — TPUs need no loss scale.

Optimizer parity with the reference recipe (ref exp_panoptic.py:201-212,
configs/_base_/schedules/mmdet_schedule_1x.py): SGD momentum 0.9, coupled
L2 weight decay, ``bias_lr_mult=2`` / ``bias_decay_mult=0`` for non-norm
biases, global-norm grad clip 35, linear warmup 250 iters at 1/3, step
decay x0.1 at epochs [16, 20]. Backbone stage freezing
(``frozen_stages``, ref mspn_mmpose.py:635-646) is realised by zeroing
updates for the frozen prefix set.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.targets import get_targets


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


# ------------------------------------------------------------------ sched

def make_lr_fn(base_lr: float,
               warmup_iters: int = 250,
               warmup_ratio: float = 1.0 / 3,
               step_epochs: Sequence[int] = (16, 20),
               gamma: float = 0.1,
               steps_per_epoch: int = 1000) -> Callable[[jnp.ndarray],
                                                        jnp.ndarray]:
    """mmcv StepLrUpdater + linear warmup (ref exp_panoptic.py:207-212)."""
    milestones = jnp.asarray([e * steps_per_epoch for e in step_epochs])

    def lr_fn(step):
        step = step.astype(jnp.float32)
        k = (1.0 - step / warmup_iters) * (1.0 - warmup_ratio)
        warm = jnp.where(step < warmup_iters, 1.0 - k, 1.0)
        decay = gamma ** (step >= milestones.astype(jnp.float32)).sum()
        return base_lr * warm * decay

    return lr_fn


# -------------------------------------------------------------- optimizer

def _path_str(path) -> str:
    return '/'.join(str(getattr(k, 'key', k)) for k in path)


def param_groups(params) -> Tuple[Any, Any]:
    """(lr_mult, wd_mult) trees mirroring mmcv DefaultOptimizerConstructor:
    non-norm bias params get bias_lr_mult / bias_decay_mult."""
    def mults(path, leaf):
        parts = _path_str(path).split('/')
        is_norm = any(c in ('bn', 'gn') for c in parts[:-1])
        is_bias = parts[-1] == 'bias'
        if is_bias and not is_norm:
            return (2.0, 0.0)
        return (1.0, 1.0)

    lr_mult = jax.tree_util.tree_map_with_path(
        lambda p, x: mults(p, x)[0], params)
    wd_mult = jax.tree_util.tree_map_with_path(
        lambda p, x: mults(p, x)[1], params)
    return lr_mult, wd_mult


def frozen_mask(params, frozen_prefixes: Sequence[str]):
    """1.0 for trainable leaves, 0.0 for frozen ones."""
    def fn(path, x):
        p = _path_str(path)
        return 0.0 if any(p.startswith(f) for f in frozen_prefixes) else 1.0
    return jax.tree_util.tree_map_with_path(fn, params)


def make_optimizer(params,
                   lr_fn: Callable,
                   momentum: float = 0.9,
                   weight_decay: float = 1e-4,
                   grad_clip: float = 35.0,
                   bias_lr_mult: float = 2.0,
                   bias_decay_mult: float = 0.0,
                   frozen_prefixes: Sequence[str] = ()):
    lr_mult, wd_mult = param_groups(params)
    trainable = frozen_mask(params, frozen_prefixes)

    def tx_update(grads, opt_state, params):
        mom = opt_state['momentum']
        count = opt_state['count']
        # global-norm clip (torch clip_grad_norm_, max_norm=35, L2)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
        # coupled L2 decay with per-param decay mult (torch SGD semantics)
        grads = jax.tree.map(
            lambda g, p, wm: g + weight_decay * wm * p,
            grads, params, wd_mult)
        # heavy-ball momentum
        mom = jax.tree.map(lambda m, g: momentum * m + g, mom, grads)
        lr = lr_fn(count)
        updates = jax.tree.map(
            lambda m, lm, t: -lr * lm * t * m, mom, lr_mult, trainable)
        return updates, dict(momentum=mom, count=count + 1), gnorm

    def tx_init(params):
        return dict(momentum=jax.tree.map(jnp.zeros_like, params),
                    count=jnp.zeros((), jnp.int32))

    return tx_init, tx_update


def mspn_frozen_prefixes(frozen_stages: int) -> Tuple[str, ...]:
    """Parameter prefixes frozen by ``frozen_stages``
    (ref mspn_mmpose.py:635-646: the stem, plus layer1..layerK of the
    first stage's downsample tower)."""
    if frozen_stages < 0:
        return ()
    prefixes = ['backbone/top/']
    for i in range(1, frozen_stages + 1):
        prefixes.append(f'backbone/stage0/downsample/layer{i}_')
    return tuple(prefixes)


# ------------------------------------------------------------- train step

def make_train_step(model,
                    tx_update,
                    featmap_sizes,
                    strides,
                    regress_ranges,
                    num_joints: int,
                    center_sample_radius: float = 1.5,
                    centerness_alpha: float = 2.5,
                    bg_label: int = 1,
                    max_pos: int = 1024,
                    donate: bool = True,
                    img_norm=None):
    """Build the jitted SPMD train step.

    ``img_norm`` (dict with mean/std/to_rgb) moves image normalization
    onto the device: the loader then ships raw-range pixels and the
    (mean-sub, std-div, BGR->RGB) runs fused into the first conv — on a
    busy host this removes ~20% of the per-image CPU cost
    (tools/analysis_tools/loader_bench.py).

    The returned function maps (state, batch) -> (state, metrics) where
    ``batch`` holds NHWC images plus padded GT arrays:
      img (B,H,W,3), gt_poses_3d (B,G,3+4J), gt_centers2d (B,G,2),
      gt_depths (B,G), gt_valid (B,G).
    """

    if img_norm is not None:
        _mean = jnp.asarray(img_norm['mean'], jnp.float32)
        _std = jnp.asarray(img_norm['std'], jnp.float32)
        _to_rgb = bool(img_norm.get('to_rgb', False))

    def loss_fn(params, batch_stats, batch):
        if img_norm is not None:
            img = batch['img']
            if _to_rgb:
                img = img[..., ::-1]
            batch = dict(batch, img=(img - _mean) / _std)
        targets = get_targets(
            featmap_sizes, strides, regress_ranges,
            batch['gt_poses_3d'], batch['gt_centers2d'],
            batch['gt_depths'], batch['gt_valid'],
            num_joints, center_sample_radius, centerness_alpha, bg_label)
        losses, mutated = model.apply(
            dict(params=params, batch_stats=batch_stats),
            batch['img'], targets, max_pos,
            method=type(model).loss, mutable=['batch_stats'])
        # mmcv convention (ref mmdet BaseDetector._parse_losses): only
        # 'loss*' keys are optimized; others (pos_overflow, ...) are
        # carried as metrics
        total = sum(v for k, v in losses.items() if 'loss' in k)
        return total, (losses, mutated['batch_stats'])

    def train_step(state: TrainState, batch):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt_state, gnorm = tx_update(
            grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics = dict(loss=total, grad_norm=gnorm, **losses)
        return TrainState(state.step + 1, new_params, new_stats,
                          new_opt_state), metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
