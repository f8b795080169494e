"""Environment report (ref: mmdet3d/utils/collect_env.py)."""

from __future__ import annotations

import platform
import sys


def collect_env():
    env = {}
    env['sys.platform'] = sys.platform
    env['Python'] = sys.version.replace('\n', '')
    env['Platform'] = platform.platform()
    try:
        import jax
        env['JAX'] = jax.__version__
        env['jaxlib backend'] = jax.default_backend()
        env['Devices'] = ', '.join(str(d) for d in jax.devices())
    except Exception as e:            # pragma: no cover
        env['JAX'] = f'unavailable ({e})'
    for mod in ('flax', 'optax', 'numpy', 'cv2'):
        try:
            m = __import__(mod)
            env[mod] = getattr(m, '__version__', 'unknown')
        except ImportError:
            env[mod] = 'not installed'
    import das_tpu
    env['das_tpu'] = das_tpu.__version__
    return env


if __name__ == '__main__':
    for k, v in collect_env().items():
        print(f'{k}: {v}')
