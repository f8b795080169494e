"""Evaluation loop (ref: tools/test.py + mmdet3d/apis/test.py:11-40).

Batches test samples by padded resolution bucket so each bucket compiles
once, runs the fused predict program on device, and converts the
fixed-shape results to the reference's per-image output dicts for
``dataset.evaluate``.
"""

from __future__ import annotations

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


def run_test(model, variables, dataset, cfg, batch_size: int = 4,
             progress: bool = True) -> List[Dict]:
    """Single-host test sweep. Returns reference-style output dicts in
    dataset order."""
    head_cfg = cfg.model.bbox_head
    predict = make_predict_fn(model, dict(cfg.model.test_cfg),
                              int(head_cfg.num_joints),
                              tuple(head_cfg.strides))

    # group sample indices by padded shape (compile bucket)
    buckets = defaultdict(list)
    samples = []
    for idx in range(len(dataset)):
        s = _sample_arrays(dataset[idx])
        samples.append(s)
        buckets[s['img'].shape].append(idx)

    results: List[Any] = [None] * len(dataset)
    done = 0
    for shape, idxs in buckets.items():
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start:start + batch_size]
            # pad the last batch to full size to avoid a recompile
            pad_to = batch_size
            batch_idx = chunk + [chunk[-1]] * (pad_to - len(chunk))
            imgs = np.stack([samples[i]['img'] for i in batch_idx])
            sfs = np.stack([np.asarray(
                samples[i]['img_metas']['scale_factor'][:2], np.float32)
                for i in batch_idx])
            decoded = predict(variables, imgs, sfs)
            paths = [samples[i]['img_metas']['filename']
                     for i in batch_idx]
            outs = results_to_host(
                {k: v for k, v in decoded.items()}, paths)
            for j, i in enumerate(chunk):
                results[i] = outs[j]
            done += len(chunk)
            if progress:
                print(f'\r[das_tpu] test {done}/{len(dataset)}', end='',
                      flush=True)
    if progress:
        print()
    return results
