"""Evaluation loop (ref: tools/test.py + mmdet3d/apis/test.py:11-40).

Batches test samples by padded resolution bucket so each bucket compiles
once, runs the fused predict program on device, and converts the
fixed-shape results to the reference's per-image output dicts for
``dataset.evaluate``.

Multi-host: each process sweeps an interleaved shard and the decoded
fixed-size arrays are allgathered at the end — the TPU-native version of
mmdet's ``collect_results_cpu`` (SURVEY.md §2.2).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Any, Dict, List

import numpy as np

from .inference import make_predict_fn, results_to_host


def _sample_arrays(sample: Dict) -> Dict:
    """Unwrap a MultiScaleFlipAug sample (lists of len 1)."""
    out = {}
    for k, v in sample.items():
        out[k] = v[0] if isinstance(v, list) else v
    return out


def _sweep(model, variables, get_sample, n: int, cfg, batch_size: int,
           progress: bool) -> List[Dict]:
    """Single-process sweep over samples ``get_sample(0..n-1)``."""
    head_cfg = cfg.model.bbox_head
    predict = make_predict_fn(model, dict(cfg.model.test_cfg),
                              int(head_cfg.num_joints),
                              tuple(head_cfg.strides))

    buckets = defaultdict(list)
    samples = []
    for idx in range(n):
        s = _sample_arrays(get_sample(idx))
        samples.append(s)
        buckets[s['img'].shape].append(idx)

    results: List[Any] = [None] * n
    done = 0
    for shape, idxs in buckets.items():
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start:start + batch_size]
            # pad the last batch to full size to avoid a recompile
            batch_idx = chunk + [chunk[-1]] * (batch_size - len(chunk))
            imgs = np.stack([samples[i]['img'] for i in batch_idx])
            sfs = np.stack([np.asarray(
                samples[i]['img_metas']['scale_factor'][:2], np.float32)
                for i in batch_idx])
            decoded = predict(variables, imgs, sfs)
            paths = [samples[i]['img_metas']['filename']
                     for i in batch_idx]
            outs = results_to_host(decoded, paths)
            for j, i in enumerate(chunk):
                results[i] = outs[j]
            done += len(chunk)
            if progress:
                print(f'\r[das_tpu] test {done}/{n}', end='', flush=True)
    if progress:
        print()
    return results


def run_test(model, variables, dataset, cfg, batch_size: int = 4,
             progress: bool = True) -> List[Dict]:
    """Test sweep; returns reference-style output dicts in dataset order."""
    import jax

    if jax.process_count() == 1:
        return _sweep(model, variables, lambda i: dataset[i],
                      len(dataset), cfg, batch_size, progress)

    from jax.experimental import multihost_utils as mhu

    pid, nproc = jax.process_index(), jax.process_count()
    my_idx = list(range(pid, len(dataset), nproc))
    shard_results = _sweep(model, variables,
                           lambda i: dataset[my_idx[i]], len(my_idx),
                           cfg, batch_size, progress and pid == 0)

    # pad to a uniform per-process count, allgather fixed-size arrays
    n_max = -(-len(dataset) // nproc)
    J = int(cfg.model.bbox_head.num_joints)
    K = int(cfg.model.test_cfg.get('nms_post', 100))
    poses = np.zeros((n_max, K, J, 3), np.float32)
    scores = np.zeros((n_max, K), np.float32)
    centers = np.zeros((n_max, K, 3), np.float32)
    counts = np.zeros((n_max,), np.int32)
    for i, r in enumerate(shard_results):
        k = len(r['poses'])
        poses[i, :k] = r['poses']
        scores[i, :k] = r['scores']
        centers[i, :k] = r['centers']
        counts[i] = k
    gathered = {k: np.asarray(mhu.process_allgather(v))
                for k, v in dict(poses=poses, scores=scores,
                                 centers=centers, counts=counts).items()}

    results: List[Any] = [None] * len(dataset)
    for p in range(nproc):
        for i, idx in enumerate(range(p, len(dataset), nproc)):
            k = int(gathered['counts'][p, i])
            results[idx] = dict(
                poses=gathered['poses'][p, i, :k],
                vis=np.ones((k, J), np.float32),
                centers=gathered['centers'][p, i, :k],
                image_paths=[_filename(dataset, idx)],
                scores=gathered['scores'][p, i, :k].tolist())
    return results


def _filename(dataset, idx):
    info = dataset.data_infos[idx]
    prefix = getattr(dataset, 'img_prefix', '') or ''
    return os.path.join(prefix, info['file_name']) if prefix \
        else info['file_name']
