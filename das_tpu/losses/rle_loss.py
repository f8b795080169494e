"""Residual log-likelihood (RLE) regression loss.

TPU rebuild of the reference's ``RLELoss3D``
(ref: mmdet3d/models/losses/residual_log_likelihood_loss.py:8-37):
``loss = nf_loss + logQ`` where ``nf_loss = log(sigma) - log_phi`` comes from
the RealNVP flow (computed in the head) and ``logQ`` is the residual Laplace
term, all masked by per-joint visibility and normalised by visible count.

Kept in float32 — the reference forces fp32 on the whole loss
(das_head.py:281-282).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_AMP = 1.0 / math.sqrt(2.0 * math.pi)


def rle_loss(nf_loss: jnp.ndarray,
             uvd: jnp.ndarray,
             sigma: jnp.ndarray,
             gt_uvd: jnp.ndarray,
             gt_uv_weight: jnp.ndarray,
             weight: jnp.ndarray = None,
             residual: bool = True) -> jnp.ndarray:
    """RLE loss.

    Args:
        nf_loss:      (P, J, 3) ``log(sigma) - log_phi`` from the flow
        uvd:          (P, J, 3) predicted joint offsets
        sigma:        (P, J, 3) predicted scales (sigmoid + eps, >0)
        gt_uvd:       (P, J, 3) targets
        gt_uv_weight: (P, J, 3) visibility weights in {0,1}
        weight:       broadcastable extra weight (code_weight)
    Returns scalar loss.
    """
    nf_loss = nf_loss.astype(jnp.float32) * gt_uv_weight
    vis_count = gt_uv_weight[..., 0].sum()

    loss = nf_loss
    if residual:
        log_q = jnp.log(sigma / _AMP) + \
            jnp.abs(gt_uvd - uvd) / (math.sqrt(2.0) * sigma + 1e-9)
        loss = nf_loss + log_q * gt_uv_weight
    if weight is not None:
        loss = loss * weight
    total = loss.sum() / jnp.maximum(vis_count, 1e-9)
    # reference returns 0 when fewer than one visible joint
    return jnp.where(vis_count < 1.0, 0.0, total)
