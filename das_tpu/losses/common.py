"""Pure-XLA loss functions used by the DAS head.

Replaces the reference's CUDA ``sigmoid_focal_loss`` and mmdet loss wrappers
(built at anchor_free_mono3d_pose_head.py:60-62) with elementwise jnp math —
no kernel needed on TPU; XLA fuses these into the surrounding graph.

Loss math is kept in float32 regardless of compute dtype, mirroring the
reference's ``@force_fp32`` island on the loss (das_head.py:281-282).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray,
                       labels: jnp.ndarray,
                       gamma: float = 2.0,
                       alpha: float = 0.25,
                       avg_factor: float = None) -> jnp.ndarray:
    """mmdet-compatible sigmoid focal loss.

    Args:
        logits: (N, num_classes) raw scores.
        labels: (N,) int class ids; ``num_classes`` means background.
        avg_factor: divisor of the summed loss.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    # one-hot over (num_classes + 1) then drop the background column
    target = jax.nn.one_hot(labels, num_classes + 1,
                            dtype=jnp.float32)[..., :num_classes]
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * target + p * (1.0 - target)
    focal_weight = (alpha * target + (1.0 - alpha) * (1.0 - target)) * \
        jnp.power(pt, gamma)
    bce = _bce_with_logits(logits, target)
    loss = (bce * focal_weight).sum()
    if avg_factor is not None:
        loss = loss / avg_factor
    return loss


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray):
    """Numerically-stable binary cross entropy with logits (elementwise)."""
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def binary_cross_entropy(logits: jnp.ndarray,
                         targets: jnp.ndarray,
                         weight: jnp.ndarray = None,
                         avg_factor: float = None) -> jnp.ndarray:
    """mmdet CrossEntropyLoss(use_sigmoid=True): element BCE, mean-reduced."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = _bce_with_logits(logits, targets)
    if weight is not None:
        loss = loss * weight
        if avg_factor is None:
            denom = jnp.maximum(weight.sum(), 1e-12)
            return loss.sum() / denom
    if avg_factor is not None:
        return loss.sum() / avg_factor
    return loss.mean()


def smooth_l1_loss(pred: jnp.ndarray,
                   target: jnp.ndarray,
                   beta: float = 1.0 / 9.0,
                   weight: jnp.ndarray = None,
                   avg_factor: float = None) -> jnp.ndarray:
    """mmdet SmoothL1Loss: huber with knee ``beta``; sum/avg_factor."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    if weight is not None:
        loss = loss * weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / jnp.maximum(avg_factor, 1e-12)
    return loss
