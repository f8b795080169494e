"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference never had a multi-device-capable test backend (SURVEY.md §4);
we force the XLA host platform with 8 devices so sharding paths are testable
without TPU hardware.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# Belt and braces: this environment's axon TPU plugin sometimes ignores
# the JAX_PLATFORMS env var (observed to change across terminal rebuilds
# mid-session); the config API is binding either way.
jax.config.update('jax_platforms', 'cpu')

# parity tests compare against torch fp32; disable bf16 matmul passthrough
jax.config.update('jax_default_matmul_precision', 'highest')

# XLA-CPU compiles are slow in this environment; cache them across runs.
# The dir is keyed by host CPU features: foreign-machine AOT artifacts
# in a shared cache SIGABRT at load (observed with the remote compile
# relay in this environment).
import sys as _sys
_sys.path.insert(0, __file__.rsplit('/', 2)[0])
from das_tpu.utils.cache import jax_cache_dir
jax.config.update('jax_compilation_cache_dir', jax_cache_dir())
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
