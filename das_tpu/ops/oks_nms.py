"""OKS (object-keypoint-similarity) NMS.

The reference runs greedy OKS-NMS as an O(N^2) python/numpy loop on the host
(ref: mmdet3d/core/post_processing/pose_nms.py:92-126,153-195), forcing a
device->host sync per image. Here the hard-NMS variant is reformulated with
fixed shapes so it jits onto the TPU inside the fused decode:

* the pairwise OKS matrix is computed once as a batched vector op,
* greedy suppression is a ``lax.fori_loop`` of M vector steps.

Numpy reference implementations are kept for the evaluators and as the
ground truth in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

COCO17_SIGMAS = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07,
    .87, .87, .89, .89
]) / 10.0


def default_sigmas(num_joints: int) -> np.ndarray:
    """Per-joint OKS sigmas (ref: pose_nms.py:65-72)."""
    if num_joints == 17:
        return COCO17_SIGMAS.copy()
    return np.ones(num_joints, dtype=np.float64) * 0.08


# --------------------------------------------------------------------- jax

def oks_matrix(kpts: jnp.ndarray, areas: jnp.ndarray,
               sigmas: jnp.ndarray) -> jnp.ndarray:
    """Pairwise OKS.

    Args:
        kpts:  (M, J, 2) xy keypoints
        areas: (M,)
        sigmas: (J,)
    Returns (M, M) OKS similarity.
    """
    variances = (2.0 * sigmas) ** 2                          # (J,)
    d2 = ((kpts[:, None] - kpts[None, :]) ** 2).sum(-1)      # (M, M, J)
    scale = (areas[:, None] + areas[None, :]) / 2.0 + np.spacing(1)
    e = d2 / variances[None, None, :] / scale[..., None] / 2.0
    return jnp.exp(-e).mean(-1)


def oks_nms_fixed(kpts: jnp.ndarray,
                  scores: jnp.ndarray,
                  areas: jnp.ndarray,
                  valid: jnp.ndarray,
                  thr: float,
                  sigmas: np.ndarray) -> jnp.ndarray:
    """Greedy hard OKS-NMS over a fixed-size candidate set (jit-able).

    Candidates must already be sorted by score descending (invalid entries
    carry score -inf and sort last). Returns a keep mask (M,) where kept
    entries follow the same greedy order as the reference's ``oks_nms``.
    """
    M = kpts.shape[0]
    sim = oks_matrix(kpts, areas, jnp.asarray(sigmas, kpts.dtype))

    def body(i, keep):
        # candidate i survives iff no higher-scoring kept candidate overlaps
        row = sim[i]                                          # (M,)
        idx = jnp.arange(M)
        suppressor = (idx < i) & keep & (row > thr)
        keep_i = jnp.logical_not(suppressor.any()) & valid[i]
        return keep.at[i].set(keep_i)

    keep0 = jnp.zeros((M,), bool)
    return jax.lax.fori_loop(0, M, body, keep0)


def soft_oks_nms_fixed(kpts: jnp.ndarray,
                       scores: jnp.ndarray,
                       areas: jnp.ndarray,
                       valid: jnp.ndarray,
                       thr: float,
                       max_dets: int,
                       sigmas: np.ndarray):
    """Soft OKS-NMS with gaussian rescoring, fixed shapes (jit-able).

    Reformulates the reference's ``soft_oks_nms`` (ref pose_nms.py:153-195):
    each of ``max_dets`` rounds picks the argmax of the (iteratively
    decayed) scores, then decays every remaining candidate by
    ``exp(-oks^2 / thr)`` against the pick. Returns
    ``(gather_idx (max_dets,), out_valid (max_dets,))`` in selection
    order — the caller indexes the ORIGINAL scores with ``gather_idx``
    exactly like the reference (das_head.py:790-794).
    """
    sim = oks_matrix(kpts, areas, jnp.asarray(sigmas, kpts.dtype))
    s0 = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    order0 = jnp.full((max_dets,), -1, jnp.int32)

    def body(k, carry):
        s, order = carry
        i = jnp.argmax(s)
        ok = s[i] > -jnp.inf
        order = order.at[k].set(jnp.where(ok, i.astype(jnp.int32), -1))
        s = s * jnp.exp(-(sim[i] ** 2) / thr)
        s = s.at[i].set(-jnp.inf)
        return s, order

    _, order = jax.lax.fori_loop(0, max_dets, body, (s0, order0))
    out_valid = order >= 0
    return jnp.where(out_valid, order, 0), out_valid


# ------------------------------------------------------------------- numpy

def oks_iou_np(g, d, a_g, a_d, sigmas=None):
    """OKS of pose ``g`` against each pose in ``d`` (numpy, eval path)."""
    if sigmas is None:
        sigmas = default_sigmas(len(g) // 3)
    variances = (sigmas * 2) ** 2
    xg, yg = g[0::3], g[1::3]
    ious = np.zeros(len(d), dtype=np.float32)
    for i in range(len(d)):
        dx = d[i, 0::3] - xg
        dy = d[i, 1::3] - yg
        e = (dx ** 2 + dy ** 2) / variances / \
            ((a_g + a_d[i]) / 2 + np.spacing(1)) / 2
        ious[i] = np.sum(np.exp(-e)) / len(e) if len(e) != 0 else 0.0
    return ious


def oks_nms_np(kpts_db, thr, sigmas=None):
    """Greedy hard OKS-NMS (numpy reference, ref pose_nms.py:92-126)."""
    if len(kpts_db) == 0:
        return []
    scores = np.array([k['score'] for k in kpts_db])
    kpts = np.array([k['keypoints'].flatten() for k in kpts_db])
    areas = np.array([k['area'] for k in kpts_db])
    order = scores.argsort()[::-1]
    keep = []
    while len(order) > 0:
        i = order[0]
        keep.append(i)
        ovr = oks_iou_np(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
                         sigmas)
        inds = np.where(ovr <= thr)[0]
        order = order[inds + 1]
    return np.array(keep)


def soft_oks_nms_np(kpts_db, thr, max_dets=20, sigmas=None):
    """Soft OKS-NMS with gaussian rescoring (ref pose_nms.py:153-195)."""
    if len(kpts_db) == 0:
        return []
    scores = np.array([k['score'] for k in kpts_db])
    kpts = np.array([k['keypoints'].flatten() for k in kpts_db])
    areas = np.array([k['area'] for k in kpts_db])
    order = scores.argsort()[::-1]
    scores = scores[order]
    keep = np.zeros(max_dets, dtype=np.intp)
    keep_cnt = 0
    while len(order) > 0 and keep_cnt < max_dets:
        i = order[0]
        ovr = oks_iou_np(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
                         sigmas)
        order = order[1:]
        scores = scores[1:] * np.exp(-ovr ** 2 / thr)
        tmp = scores.argsort()[::-1]
        order = order[tmp]
        scores = scores[tmp]
        keep[keep_cnt] = i
        keep_cnt += 1
    return keep[:keep_cnt]
