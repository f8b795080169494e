"""RealNVP flow + RLE loss numerical checks against torch-built mirrors
(flow math per real_nvp.py:51-88, loss per
residual_log_likelihood_loss.py:18-37)."""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from das_tpu.models.real_nvp import RealNVP
from das_tpu.losses.rle_loss import rle_loss

RNG = np.random.RandomState(7)


def torch_flow_logprob(x, masks, s_nets, t_nets, dim):
    """Inverse-pass log-prob computed with torch modules."""
    x = torch.from_numpy(x)
    log_det = torch.zeros(x.shape[0])
    z = x
    for i in reversed(range(len(masks))):
        m = torch.from_numpy(masks[i])
        z_ = m * z
        s = s_nets[i](z_) * (1 - m)
        t = t_nets[i](z_) * (1 - m)
        z = (1 - m) * (z - t) * torch.exp(-s) + z_
        log_det = log_det - s.sum(dim=1)
    prior = -0.5 * (z ** 2).sum(dim=1) - 0.5 * dim * math.log(2 * math.pi)
    return (prior + log_det).detach().numpy()


def _mlp_torch(dim, tanh):
    layers = [nn.Linear(dim, 64), nn.LeakyReLU(), nn.Linear(64, 64),
              nn.LeakyReLU(), nn.Linear(64, dim)]
    if tanh:
        layers.append(nn.Tanh())
    return nn.Sequential(*layers)


def test_realnvp_matches_torch_mirror():
    for dim in (2, 3):
        flow = RealNVP(dim=dim)
        x = RNG.randn(32, dim).astype(np.float32)
        params = flow.init(jax.random.PRNGKey(0), jnp.asarray(x))

        masks = flow.masks
        s_nets, t_nets = [], []
        p = params['params']
        for i in range(6):
            for nets, prefix, tanh in ((s_nets, 's', True),
                                       (t_nets, 't', False)):
                net = _mlp_torch(dim, tanh)
                with torch.no_grad():
                    for j, li in enumerate([0, 2, 4]):
                        leaf = p[f'{prefix}_{i}_{j}']
                        net[li].weight.copy_(torch.from_numpy(
                            np.asarray(leaf['kernel']).T))
                        net[li].bias.copy_(torch.from_numpy(
                            np.asarray(leaf['bias'])))
                nets.append(net)

        ref = torch_flow_logprob(x, masks, s_nets, t_nets, dim)
        ours = np.asarray(flow.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_rle_loss_formula():
    P, J = 6, 3
    nf = RNG.randn(P, J, 3).astype(np.float32)
    uvd = RNG.randn(P, J, 3).astype(np.float32)
    sigma = np.abs(RNG.randn(P, J, 3).astype(np.float32)) + 0.1
    gt = RNG.randn(P, J, 3).astype(np.float32)
    w = (RNG.rand(P, J, 1) > 0.3).astype(np.float32)
    w3 = np.broadcast_to(w, (P, J, 3))

    amp = 1 / math.sqrt(2 * math.pi)
    logq = np.log(sigma / amp) + np.abs(gt - uvd) / \
        (math.sqrt(2) * sigma + 1e-9)
    expect = ((nf * w3) + logq * w3).sum() / w3[..., 0].sum()

    got = rle_loss(jnp.asarray(nf), jnp.asarray(uvd), jnp.asarray(sigma),
                   jnp.asarray(gt), jnp.asarray(w3))
    np.testing.assert_allclose(float(got), expect, rtol=1e-5)


def test_rle_loss_zero_when_invisible():
    P, J = 2, 3
    zeros = jnp.zeros((P, J, 3))
    got = rle_loss(zeros, zeros, jnp.ones((P, J, 3)), zeros,
                   jnp.zeros((P, J, 3)))
    assert float(got) == 0.0
