"""Fold BatchNorm into the preceding conv for inference
(ref tools/test.py:175-176 ``--fuse-conv-bn`` / mmcv fuse_conv_bn).

Works purely on the variables tree: every ``{conv, bn}`` sibling pair
(the ConvModule layout, models/layers.py) gets the BN scale folded into
the conv kernel and the additive term into the BN affine, which is reset
to identity statistics (mean=0, var=1, scale=1) — the module structure
(and the no-bias conv) is unchanged, so the fused tree drops into the
same ``model.apply``. XLA already fuses the eval-mode BN affine into the
conv, so on TPU this is config-surface parity more than a perf lever.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-5


def _is_mapping(x):
    return hasattr(x, 'keys') and hasattr(x, '__getitem__')


def _deep_dict(tree):
    if _is_mapping(tree):
        return {k: _deep_dict(tree[k]) for k in tree}
    return tree


def fuse_conv_bn(variables):
    """Return ``(new_variables, num_fused_pairs)``; inputs unmodified."""
    params = _deep_dict(variables['params'])
    stats = _deep_dict(variables['batch_stats'])
    n = _fuse_node(params, stats)
    out = dict(variables)
    out['params'] = params
    out['batch_stats'] = stats
    return out, n


def _fuse_node(p_node, s_node) -> int:
    if not _is_mapping(p_node):
        return 0
    n = 0
    for key in list(p_node):
        child = p_node[key]
        s_child = s_node.get(key, {}) if _is_mapping(s_node) else {}
        n += _fuse_node(child, s_child)
    if ('conv' in p_node and 'bn' in p_node
            and _is_mapping(p_node['conv'])
            and 'kernel' in p_node['conv']
            and _is_mapping(s_node) and 'bn' in s_node):
        conv, bn, st = p_node['conv'], p_node['bn'], s_node['bn']
        gamma = jnp.asarray(bn['scale'], jnp.float32)
        beta = jnp.asarray(bn['bias'], jnp.float32)
        mean = jnp.asarray(st['mean'], jnp.float32)
        var = jnp.asarray(st['var'], jnp.float32)
        factor = gamma / jnp.sqrt(var + _EPS)              # (Cout,)
        # the identity BN left behind still divides by sqrt(1 + eps);
        # pre-scale by denom so the composition is exact
        denom = jnp.sqrt(1.0 + _EPS)
        kernel = jnp.asarray(conv['kernel'])
        conv['kernel'] = (kernel.astype(jnp.float32) * factor
                          * denom).astype(kernel.dtype)    # HWIO
        if 'bias' in conv:
            b = jnp.asarray(conv['bias'], jnp.float32)
            conv['bias'] = (((b - mean) * factor + beta)
                            * denom).astype(jnp.float32)
            bn_bias = jnp.zeros_like(beta)
        else:
            bn_bias = beta - mean * factor
        bn['scale'] = jnp.ones_like(gamma)
        bn['bias'] = bn_bias.astype(jnp.float32)
        st['mean'] = jnp.zeros_like(mean)
        st['var'] = jnp.ones_like(var)
        n += 1
    return n
