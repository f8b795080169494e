"""RealNVP normalizing flows for the RLE loss (TPU/flax rebuild).

Rebuilds the reference's 6-coupling-layer flows
(ref: mmdet3d/models/pose_heads/real_nvp.py:29-101): alternating binary
masks, 64-wide MLP scale/translate nets (tanh on the scale net), and
``log_prob = N(z; 0, I) + log|det J|`` via the inverse pass.

These are tiny MLPs evaluated on (P*J, dim) batches; they run as plain
MXU matmuls. Loss-path numerics stay in float32.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _mlp(x: jnp.ndarray, dim: int, name: str, tanh_out: bool) -> jnp.ndarray:
    x = nn.Dense(64, name=f'{name}_0', dtype=jnp.float32)(x)
    x = nn.leaky_relu(x, negative_slope=0.01)
    x = nn.Dense(64, name=f'{name}_1', dtype=jnp.float32)(x)
    x = nn.leaky_relu(x, negative_slope=0.01)
    x = nn.Dense(dim, name=f'{name}_2', dtype=jnp.float32)(x)
    if tanh_out:
        x = jnp.tanh(x)
    return x


class RealNVP(nn.Module):
    """dim-D RealNVP with 6 coupling layers.

    ``dim=3`` uses masks [[0,0,1],[1,1,0]]*3 (ref real_nvp.py:35);
    ``dim=2`` uses [[0,1],[1,0]]*3 (ref real_nvp.py:97).
    """
    dim: int = 3

    @property
    def masks(self) -> np.ndarray:
        if self.dim == 3:
            return np.array([[0, 0, 1], [1, 1, 0]] * 3, np.float32)
        return np.array([[0, 1], [1, 0]] * 3, np.float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """log_prob of x, shape (N, dim) -> (N,)."""
        masks = self.masks
        x = x.astype(jnp.float32)
        log_det = jnp.zeros(x.shape[0], jnp.float32)
        z = x
        for i in reversed(range(len(masks))):
            m = jnp.asarray(masks[i])
            z_ = m * z
            s = _mlp(z_, self.dim, f's_{i}', tanh_out=True) * (1 - m)
            t = _mlp(z_, self.dim, f't_{i}', tanh_out=False) * (1 - m)
            z = (1 - m) * (z - t) * jnp.exp(-s) + z_
            log_det = log_det - s.sum(axis=1)
        prior = -0.5 * (z ** 2).sum(axis=1) \
            - 0.5 * self.dim * math.log(2.0 * math.pi)
        return prior + log_det
