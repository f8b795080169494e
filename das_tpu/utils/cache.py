"""Machine-keyed XLA compilation cache directory.

XLA:CPU AOT artifacts are machine-feature specific; in this environment
compiles may be served by a remote helper running on different hardware,
and loading a foreign AOT artifact SIGABRTs the process. Keying the
cache path by the host CPU's feature flags makes poisoning structurally
impossible.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_key() -> str:
    feats = platform.machine()
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    feats += line
                    break
    except OSError:
        pass
    return hashlib.md5(feats.encode()).hexdigest()[:10]


def jax_cache_dir(base: str = '/tmp/das_tpu_jax_cache') -> str:
    # DAS_TPU_JAX_CACHE_BASE overrides the location (e.g. a throwaway
    # dir for cold-compile measurements, or a persistent volume in CI)
    base = os.environ.get('DAS_TPU_JAX_CACHE_BASE', base)
    return f'{base}_{machine_key()}'
