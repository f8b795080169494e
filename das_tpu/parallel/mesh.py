"""Device-mesh helpers.

The DAS workload parallelises over the batch (data parallelism — the
reference's only axis, SURVEY.md §2.2). ``make_mesh`` builds a 1-D
``jax.sharding.Mesh`` over all addressable devices; ``shard_batch`` /
``replicate`` place arrays so the jitted train step runs SPMD with XLA
inserting the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = 'data') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate(tree: Any, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis_name: str = 'data') -> Dict[str, Any]:
    sh = NamedSharding(mesh, P(axis_name))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
