"""Training driver (ref: mmdet3d/apis/train.py:6-35 + mmcv EpochBasedRunner
with its hook set — SURVEY.md §1 layer 3).

The mmcv runner/hook machinery collapses into one explicit loop:
LR schedule and grad clipping live inside the jitted optimizer, logging /
checkpointing / eval are plain host-side calls between steps. State is
checkpointed with orbax (replacing mmcv CheckpointHook).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..datasets import build_dataset
from ..datasets.loader import TrainLoader, train_pad_hw_from_cfg
from ..models import build_model
from ..parallel.train_step import (TrainState, make_lr_fn, make_optimizer,
                                   make_train_step, mspn_frozen_prefixes)
from ..utils.logging import MetricLogger
from ..checkpoint.orbax_io import CheckpointManager


def train_model(cfg: Config,
                work_dir: str = 'work_dirs/exp',
                resume_from: Optional[str] = None,
                load_from: Optional[str] = None,
                pretrained: Optional[str] = None,
                max_steps: Optional[int] = None,
                log_interval: Optional[int] = None,
                seed: int = 0,
                dtype=jnp.bfloat16):
    """Full training run per the config recipe."""
    os.makedirs(work_dir, exist_ok=True)
    logger = MetricLogger(work_dir,
                          interval=log_interval or
                          int(cfg.get('log_config', {}).get('interval', 50)))

    # ---------------- data
    # device_normalize: strip host-side Normalize from the train
    # pipelines and fold it into the jitted step (loader_bench.py shows
    # Normalize is ~20% of per-image host cost)
    img_norm = None
    train_data_cfg = cfg.data['train']
    if cfg.data.get('device_normalize'):
        ds_list = train_data_cfg if isinstance(
            train_data_cfg, (list, tuple)) else [train_data_cfg]
        new_list = []
        for ds_cfg in ds_list:
            ds_cfg = dict(ds_cfg)
            pipe = []
            for t in ds_cfg['pipeline']:
                if t.get('type') == 'Normalize':
                    img_norm = dict(mean=t['mean'], std=t['std'],
                                    to_rgb=t.get('to_rgb', False))
                else:
                    pipe.append(t)
            ds_cfg['pipeline'] = pipe
            new_list.append(ds_cfg)
        assert img_norm is not None, \
            'device_normalize=True but no Normalize in the train pipeline'
        train_data_cfg = new_list if isinstance(
            cfg.data['train'], (list, tuple)) else new_list[0]
    dataset = build_dataset(train_data_cfg)
    train_pipe = train_data_cfg[0]['pipeline'] if isinstance(
        train_data_cfg, (list, tuple)) else train_data_cfg['pipeline']
    pad_hw = train_pad_hw_from_cfg(train_pipe)
    batch_size = int(cfg.data.get('samples_per_gpu', 4)) * \
        jax.device_count()
    J = int(cfg.model.bbox_head.num_joints)
    loader = TrainLoader(dataset, batch_size, pad_hw, J,
                         num_workers=int(cfg.data.get('workers_per_gpu', 4)),
                         seed=seed,
                         shard_id=jax.process_index(),
                         num_shards=jax.process_count(),
                         # 'process' = spawned worker processes (torch
                         # DataLoader-style), escaping the GIL on
                         # multi-core hosts; batches are order-identical
                         worker_type=cfg.data.get('worker_type', 'thread'),
                         dataset_cfg=train_data_cfg)
    steps_per_epoch = loader.steps_per_epoch

    # ---------------- model + state
    model = build_model(dict(cfg.model), dtype=dtype)
    img0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = dict(model.init_all(jax.random.PRNGKey(seed), img0))

    ckpt_path = pretrained or cfg.model.get('pretrained')
    if load_from:
        from ..checkpoint.torch_bridge import load_torch_checkpoint
        variables, _ = load_torch_checkpoint(variables, load_from,
                                             strict=False)
    elif ckpt_path and os.path.exists(ckpt_path):
        from ..checkpoint.torch_bridge import load_mspn_pretrained
        variables, report = load_mspn_pretrained(variables, ckpt_path)
        logger.text(f'loaded pretrained backbone {ckpt_path}; '
                    f'{len(report["missing"])} leaves left at init')

    opt_cfg = cfg.get('optimizer', {})
    lr_cfg = cfg.get('lr_config', {})
    runner_cfg = cfg.get('runner', {})
    clip_cfg = (cfg.get('optimizer_config') or {}).get('grad_clip') or {}

    lr_fn = make_lr_fn(
        base_lr=float(opt_cfg.get('lr', 2e-3)),
        warmup_iters=int(lr_cfg.get('warmup_iters', 250)),
        warmup_ratio=float(lr_cfg.get('warmup_ratio', 1 / 3)),
        step_epochs=tuple(lr_cfg.get('step', [16, 20])),
        steps_per_epoch=steps_per_epoch)
    frozen = mspn_frozen_prefixes(
        int(cfg.model.backbone.get('frozen_stages', -1)))
    pw = opt_cfg.get('paramwise_cfg', {}) or {}
    tx_init, tx_update = make_optimizer(
        variables['params'], lr_fn,
        momentum=float(opt_cfg.get('momentum', 0.9)),
        weight_decay=float(opt_cfg.get('weight_decay', 1e-4)),
        grad_clip=float(clip_cfg.get('max_norm', 35.0)),
        bias_lr_mult=float(pw.get('bias_lr_mult', 2.0)),
        bias_decay_mult=float(pw.get('bias_decay_mult', 0.0)),
        frozen_prefixes=frozen)

    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables['params'],
                       batch_stats=variables['batch_stats'],
                       opt_state=tx_init(variables['params']))

    manager = CheckpointManager(
        os.path.join(work_dir, 'ckpts'),
        max_keep=int(cfg.get('checkpoint_config', {}).get(
            'max_keep_ckpts', 20)))
    # checkpoint meta (ref tools/train.py:200-210: version + config text +
    # CLASSES embedded in every checkpoint); one sidecar per run dir
    import json as _json
    import time as _time
    from .. import __version__
    classes = getattr(dataset, 'CLASSES', None)
    with open(os.path.join(work_dir, 'ckpts', 'meta.json'), 'w') as f:
        _json.dump(dict(
            das_tpu_version=__version__,
            time=_time.asctime(),
            CLASSES=list(classes) if classes else None,
            config=cfg.dump()), f, indent=1)
    if resume_from:
        state = manager.restore(state, resume_from)
        logger.text(f'resumed from {resume_from} at step '
                    f'{int(state.step)}')

    head = cfg.model.bbox_head
    featmap_sizes = [(pad_hw[0] // (4 * 2 ** i), pad_hw[1] // (4 * 2 ** i))
                     for i in range(4)]
    # positive budget: ~9 center-sampled points per person per level;
    # generous default scaled by batch, overridable via train_cfg.max_pos
    max_pos = int((cfg.model.get('train_cfg') or {}).get(
        'max_pos', 128 * batch_size))
    step_fn = make_train_step(
        model, tx_update, featmap_sizes, tuple(head.strides),
        tuple(tuple(r) for r in head.regress_ranges), J,
        center_sample_radius=float(head.get('center_sample_radius', 1.5)),
        max_pos=max_pos, img_norm=img_norm)

    total_epochs = int(runner_cfg.get('max_epochs', 22))
    total_steps = max_steps or total_epochs * steps_per_epoch
    eval_interval = int((cfg.get('evaluation') or {}).get('interval', 0))
    eval_dataset = None
    if eval_interval and 'val' in cfg.data and \
            cfg.data['val'].get('ann_file') and \
            os.path.exists(cfg.data['val']['ann_file']):
        eval_dataset = build_dataset(cfg.data['val'])

    def run_eval(state):
        """EvalHook equivalent (ref exp_panoptic.py:218)."""
        from .test import run_test
        eval_vars = dict(params=state.params,
                         batch_stats=state.batch_stats)
        outputs = run_test(model, eval_vars, eval_dataset, cfg,
                           progress=False)
        metrics = eval_dataset.evaluate(outputs)
        logger.text(f'eval @ step {int(state.step)}: '
                    + ', '.join(f'{k} {v}' for k, v in metrics.items()))

    # ---------------- mesh placement (SPMD data parallelism)
    from ..parallel.mesh import make_mesh, replicate, shard_batch
    mesh = make_mesh()
    state = replicate(state, mesh)

    # ---------------- loop
    # Two pipelining rules keep the device fed:
    #  * the step counter lives on the HOST (int(state.step) every
    #    iteration would block on the step's completion — with the jitted
    #    step being async-dispatched that sync serializes compute with
    #    dispatch latency and the input pipeline);
    #  * batches are device_put one step AHEAD (device_put is async, so
    #    the H2D transfer of batch N+1 overlaps the compute of batch N).
    def prefetch_to_mesh(it, depth=2):
        from collections import deque
        q = deque()
        for item in it:
            q.append(shard_batch(item, mesh))
            if len(q) >= depth:
                yield q.popleft()
        while q:
            yield q.popleft()

    # DCN exactness monitor: when training runs a shift/hybrid lowering
    # (dcn_gather_mode or dcn_train_gather_mode), bound the learned
    # offsets at every checkpoint — 'hybrid' is exact DCNv2 only while
    # the flagged-pixel count stays within the repair budget
    # (das_tpu/ops/deform_conv.py); a drifting run must be loud.
    head_cfg = dict(cfg.model.bbox_head)
    _modes = (str(head_cfg.get('dcn_gather_mode', 'patch')),
              str(head_cfg.get('dcn_train_gather_mode', 'auto')))
    monitor_dcn = any(m.startswith(('shift', 'hybrid')) for m in _modes)

    def check_dcn_offsets(state, step):
        if not monitor_dcn:
            return
        from .inference import validate_dcn_offsets
        shift_ok, hybrid_ok, worst = validate_dcn_offsets(
            model, dict(params=state.params,
                        batch_stats=state.batch_stats),
            int(head_cfg.get('dcn_shift_radius', 2)),
            int(head_cfg.get('dcn_shift_budget', 2048)))
        logger.text(
            f'dcn offsets @ step {step}: max|off|={worst[0]:.2f} '
            f'flagged/img={worst[1]} shift_exact={shift_ok} '
            f'hybrid_exact={hybrid_ok}'
            + ('' if hybrid_ok else
               '  <-- WARNING: repair budget exceeded, hybrid lowering '
               'is now approximate'))

    host_step = int(state.step)          # resume-aware
    t_last = time.perf_counter()
    for batch in prefetch_to_mesh(loader):
        if host_step >= total_steps:
            break
        state, metrics = step_fn(state, batch)
        host_step += 1
        logger.log(host_step, metrics, batch_size,
                   time.perf_counter() - t_last)
        t_last = time.perf_counter()
        if host_step % steps_per_epoch == 0:
            manager.save(state, host_step)
            check_dcn_offsets(state, host_step)
            epoch = host_step // steps_per_epoch
            if eval_dataset is not None and eval_interval and \
                    epoch % eval_interval == 0:
                run_eval(state)
    manager.save(state, host_step)
    check_dcn_offsets(state, host_step)
    return state
