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

def oks_row(kpt: jnp.ndarray, kpts: jnp.ndarray, area, areas: jnp.ndarray,
            sigmas: jnp.ndarray) -> jnp.ndarray:
    """OKS of one pose against all poses (ref ``oks_iou`` pose_nms.py:51).

    Args:
        kpt:   (J, 2) query pose
        kpts:  (M, J, 2) candidate poses
        area:  scalar; areas: (M,)
        sigmas: (J,)
    Returns (M,) similarity.
    """
    variances = (2.0 * sigmas) ** 2                          # (J,)
    d2 = ((kpts - kpt[None]) ** 2).sum(-1)                   # (M, J)
    scale = (area + areas) / 2.0 + np.spacing(1)             # (M,)
    e = d2 / variances[None, :] / scale[:, None] / 2.0
    return jnp.exp(-e).mean(-1)


def oks_nms_fixed(kpts: jnp.ndarray,
                  scores: jnp.ndarray,
                  areas: jnp.ndarray,
                  valid: jnp.ndarray,
                  thr: float,
                  sigmas: np.ndarray,
                  max_dets: int = None):
    """Greedy hard OKS-NMS over a fixed-size candidate set (jit-able).

    Identical semantics to the reference's ``oks_nms``
    (ref pose_nms.py:92-126): repeatedly pick the highest-scoring alive
    candidate and suppress everything with OKS > thr against it. Instead
    of walking all M candidates sequentially, each of ``max_dets`` rounds
    is one argmax + one on-the-fly OKS row — no M x M similarity matrix
    and only ``max_dets`` (not M) sequential steps, which is what makes
    the fused on-device decode fast at reference-parity candidate counts
    (nms_pre per level, das_head.py:763-783).

    Candidates need NOT be pre-sorted. Returns ``(gather_idx, out_valid)``
    of length ``max_dets`` in greedy (= score) order.
    """
    M = kpts.shape[0]
    if max_dets is None:
        max_dets = M
    sig = jnp.asarray(sigmas, jnp.float32)
    s = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    idx = jnp.arange(M)
    order0 = jnp.full((max_dets,), -1, jnp.int32)

    def cond(carry):
        k, alive, _ = carry
        # early exit once every candidate is picked or suppressed: the
        # skipped rounds would only write -1 (semantics unchanged; the
        # remaining order entries were initialised to -1)
        return (k < max_dets) & jnp.any(alive & (s > -jnp.inf))

    def body(carry):
        k, alive, order = carry
        sa = jnp.where(alive, s, -jnp.inf)
        i = jnp.argmax(sa)
        ok = sa[i] > -jnp.inf
        order = order.at[k].set(jnp.where(ok, i.astype(jnp.int32), -1))
        row = oks_row(kpts[i], kpts, areas[i], areas, sig)
        alive = alive & (row <= thr) & (idx != i)
        return k + 1, alive, order

    _, _, order = jax.lax.while_loop(cond, body, (0, valid, order0))
    out_valid = order >= 0
    return jnp.where(out_valid, order, 0), out_valid


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
    ``exp(-oks^2 / thr)`` against the pick — OKS rows computed on the
    fly, no M x M matrix. Returns ``(gather_idx (max_dets,), out_valid
    (max_dets,))`` in selection order — the caller indexes the ORIGINAL
    scores with ``gather_idx`` exactly like the reference
    (das_head.py:790-794).
    """
    sig = jnp.asarray(sigmas, jnp.float32)
    s0 = jnp.where(valid, scores.astype(jnp.float32), -jnp.inf)
    order0 = jnp.full((max_dets,), -1, jnp.int32)

    def cond(carry):
        k, s, _ = carry
        # early exit once every candidate has been picked (all -inf);
        # the skipped rounds would only write -1
        return (k < max_dets) & jnp.any(s > -jnp.inf)

    def body(carry):
        k, s, order = carry
        i = jnp.argmax(s)
        ok = s[i] > -jnp.inf
        order = order.at[k].set(jnp.where(ok, i.astype(jnp.int32), -1))
        row = oks_row(kpts[i], kpts, areas[i], areas, sig)
        s = s * jnp.exp(-(row ** 2) / thr)
        s = s.at[i].set(-jnp.inf)
        return k + 1, s, order

    _, _, order = jax.lax.while_loop(cond, body, (0, s0, order0))
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
