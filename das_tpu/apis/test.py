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


def _sample_views(sample: Dict) -> List[Dict]:
    """Split a MultiScaleFlipAug sample (dict of per-view lists) into one
    dict per augmented view (direct first, flipped second).

    View-ness is keyed off ``img`` being a list — other values may be
    plain lists (e.g. a 4-float scale_factor) without implying views."""
    if not isinstance(sample.get('img'), list):
        return [sample]
    n_views = len(sample['img'])
    views = []
    for i in range(n_views):
        views.append({
            k: (v[i] if isinstance(v, list) and len(v) == n_views else v)
            for k, v in sample.items()})
    return views


def _unflip_result(res: Dict, ori_w: int, flip_pairs) -> Dict:
    """Mirror a decoded result back to direct-view coordinates:
    x -> (W - 1 - x) in original-image pixels, swap left/right joints."""
    poses = np.array(res['poses'], np.float32, copy=True)
    centers = np.array(res['centers'], np.float32, copy=True)
    poses[..., 0] = ori_w - 1 - poses[..., 0]
    centers[..., 0] = ori_w - 1 - centers[..., 0]
    for a, b in (flip_pairs or []):
        poses[:, [a, b]] = poses[:, [b, a]]
    out = dict(res)
    out['poses'], out['centers'] = poses, centers
    return out


def merge_flip_results(direct: Dict, flipped: Dict,
                       match_frac: float = 0.5) -> Dict:
    """Average a direct-view result with an (already unflipped) flipped
    view. People are greedily matched by root xy distance; a pair matches
    when the distance is below ``match_frac`` x the direct person's pose
    extent. Unmatched direct people are kept as-is (the direct view is
    authoritative for detection; flip only refines coordinates)."""
    dp = np.asarray(direct['poses'], np.float32)
    fp = np.asarray(flipped['poses'], np.float32)
    if len(dp) == 0 or len(fp) == 0:
        return direct
    out_poses = dp.copy()
    out_centers = np.asarray(direct['centers'], np.float32).copy()
    fc = np.asarray(flipped['centers'], np.float32)
    used = np.zeros(len(fp), bool)
    for i in range(len(dp)):
        extent = max(np.ptp(dp[i, :, 0]), np.ptp(dp[i, :, 1]), 1.0)
        d = np.linalg.norm(fc[:, :2] - out_centers[i, None, :2], axis=-1)
        d = np.where(used, np.inf, d)
        j = int(np.argmin(d))
        if d[j] < match_frac * extent:
            used[j] = True
            out_poses[i] = 0.5 * (dp[i] + fp[j])
            out_centers[i] = 0.5 * (out_centers[i] + fc[j])
    out = dict(direct)
    out['poses'], out['centers'] = out_poses, out_centers
    return out


def _sweep(model, variables, get_sample, n: int, cfg, batch_size: int,
           progress: bool) -> List[Dict]:
    """Single-process sweep over samples ``get_sample(0..n-1)``.

    Each dataset item may carry 1 view (direct) or 2 (direct + flipped,
    ``MultiScaleFlipAug(flip=True)``); all views are batched through the
    same resolution buckets and flip-averaged after decode."""
    head_cfg = cfg.model.bbox_head
    predict = make_predict_fn(model, dict(cfg.model.test_cfg),
                              int(head_cfg.num_joints),
                              tuple(head_cfg.strides))

    buckets = defaultdict(list)
    views = []                  # flat list of view dicts
    view_of = []                # per dataset idx: list of flat positions
    for idx in range(n):
        vs = _sample_views(get_sample(idx))
        view_of.append([])
        for v in vs:
            view_of[idx].append(len(views))
            buckets[v['img'].shape].append(len(views))
            views.append(v)

    decoded_all: List[Any] = [None] * len(views)
    done = 0
    for shape, idxs in buckets.items():
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start:start + batch_size]
            # pad the last batch to full size to avoid a recompile
            batch_idx = chunk + [chunk[-1]] * (batch_size - len(chunk))
            imgs = np.stack([views[i]['img'] for i in batch_idx])
            sfs = np.stack([np.asarray(
                views[i]['img_metas']['scale_factor'][:2], np.float32)
                for i in batch_idx])
            decoded = predict(variables, imgs, sfs)
            paths = [views[i]['img_metas']['filename']
                     for i in batch_idx]
            outs = results_to_host(decoded, paths)
            for j, i in enumerate(chunk):
                decoded_all[i] = outs[j]
            done += len(chunk)
            if progress:
                print(f'\r[das_tpu] test {done}/{len(views)}',
                      end='', flush=True)
    if progress:
        print()

    results: List[Any] = [None] * n
    for idx in range(n):
        pos = view_of[idx]
        direct = decoded_all[pos[0]]
        if len(pos) == 1:
            results[idx] = direct
            continue
        meta = views[pos[1]]['img_metas']
        ori_w = int(meta['ori_shape'][1])
        flipped = _unflip_result(decoded_all[pos[1]], ori_w,
                                 meta.get('flip_pairs'))
        results[idx] = merge_flip_results(direct, flipped)
    return results


def _device_pre_sweep(model, variables, dataset, cfg, batch_size: int,
                      progress: bool, subset=None) -> List[Dict]:
    """Fused-preprocessing sweep: the host only JPEG-decodes; keep-ratio
    resize, BGR->RGB, normalize, pad (and the flip-test mirror) compile
    into the same XLA program as the model (SURVEY §2.3 north-star:
    cv2 host preprocessing -> on-device).

    Equivalent to the host pipeline path up to bilinear-resize rounding
    (ops/preprocess.resize_bilinear is cv2.INTER_LINEAR-parity, see
    tests/test_preprocess.py)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from ..datasets.pipelines import _rescale_size
    from ..ops.preprocess import make_preprocess_fn
    from ..core.decode import decode_batch

    head_cfg = cfg.model.bbox_head
    strides = tuple(head_cfg.strides)
    J = int(head_cfg.num_joints)
    test_cfg = dict(cfg.model.test_cfg)

    pipe = cfg.data['test']['pipeline']
    msfa = next(t for t in pipe if t.get('type') == 'MultiScaleFlipAug')
    scale = tuple(msfa['img_scale'])
    do_flip = bool(msfa.get('flip', False))
    flip_pairs = [list(p) for p in (msfa.get('flip_pairs') or [])]
    norm_t = next((t for t in msfa['transforms']
                   if t.get('type') == 'Normalize'), None)
    norm = (dict(mean=tuple(norm_t['mean']), std=tuple(norm_t['std']),
                 to_rgb=norm_t.get('to_rgb', False))
            if norm_t else dict(mean=(0., 0., 0.), std=(1., 1., 1.),
                                to_rgb=False))

    prefix = getattr(dataset, 'img_prefix', '') or ''
    infos = dataset.data_infos
    # multihost: bucket only this process's interleaved shard (indices
    # remain dataset-global; the caller allgathers)
    members = list(range(len(infos))) if subset is None else list(subset)
    n = len(members)
    buckets = defaultdict(list)
    for i in members:
        info = infos[i]
        buckets[(int(info['height']), int(info['width']))].append(i)

    results: Dict[int, Any] = {}
    done = 0
    for (h, w), idxs in buckets.items():
        new_h, new_w = _rescale_size(h, w, scale)
        pad_h, pad_w = -(-new_h // 32) * 32, -(-new_w // 32) * 32
        pre = make_preprocess_fn((h, w), (new_h, new_w), (pad_h, pad_w),
                                 **norm)

        def make_fn(flip):
            @jax.jit
            def f(variables, raw, sf):
                x = jnp.flip(raw, axis=2) if flip else raw
                img = pre(x)
                cls, pose, ctr, _ = model.apply(variables, img,
                                                train=False)
                return decode_batch(cls, pose, ctr, strides, sf, J,
                                    test_cfg)
            return f

        fn_direct = make_fn(False)
        fn_flip = make_fn(True) if do_flip else None
        sf_row = np.asarray([new_w / w, new_h / h], np.float32)

        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start:start + batch_size]
            batch_idx = chunk + [chunk[-1]] * (batch_size - len(chunk))
            raws = []
            for i in batch_idx:
                path = os.path.join(prefix, infos[i]['file_name']) \
                    if prefix else infos[i]['file_name']
                raw = cv2.imread(path, cv2.IMREAD_COLOR)
                if raw is None:
                    raise FileNotFoundError(path)
                raws.append(raw)
            raw_b = jnp.asarray(np.stack(raws))
            sf = jnp.asarray(np.tile(sf_row, (len(batch_idx), 1)))
            paths = [os.path.join(prefix, infos[i]['file_name'])
                     if prefix else infos[i]['file_name']
                     for i in batch_idx]
            outs = results_to_host(fn_direct(variables, raw_b, sf), paths)
            if do_flip:
                outs_f = results_to_host(fn_flip(variables, raw_b, sf),
                                         paths)
                outs = [merge_flip_results(
                    d, _unflip_result(f_, w, flip_pairs))
                    for d, f_ in zip(outs, outs_f)]
            for j, i in enumerate(chunk):
                results[i] = outs[j]
            done += len(chunk)
            if progress:
                print(f'\r[das_tpu] test {done}/{n}', end='', flush=True)
    if progress:
        print()
    return [results[i] for i in members]


def run_test(model, variables, dataset, cfg, batch_size: int = 4,
             progress: bool = True,
             device_preprocess: bool = None) -> List[Dict]:
    """Test sweep; returns reference-style output dicts in dataset order.

    ``device_preprocess`` (default: ``cfg.data.test.device_preprocess``)
    moves resize/normalize/pad/flip onto the device — the host only
    decodes JPEGs."""
    import jax

    if device_preprocess is None:
        device_preprocess = bool(
            cfg.data['test'].get('device_preprocess', False))

    if jax.process_count() == 1:
        if device_preprocess:
            return _device_pre_sweep(model, variables, dataset, cfg,
                                     batch_size, progress)
        return _sweep(model, variables, lambda i: dataset[i],
                      len(dataset), cfg, batch_size, progress)

    from jax.experimental import multihost_utils as mhu

    pid, nproc = jax.process_index(), jax.process_count()
    my_idx = list(range(pid, len(dataset), nproc))
    if device_preprocess:
        shard_results = _device_pre_sweep(
            model, variables, dataset, cfg, batch_size,
            progress and pid == 0, subset=my_idx)
    else:
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
