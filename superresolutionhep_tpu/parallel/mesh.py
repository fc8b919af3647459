"""Device mesh and sharding helpers.

The reference's parallelism is a latent Lightning DDP knob that every shipped
config disables (train.py:58-59, configs/single_e/train.yml:10) plus
embarrassingly-parallel PBS fan-out.  Here multi-chip is first-class: a
``jax.sharding.Mesh`` over ICI with the batch axis sharded along ``data`` and
parameters replicated; XLA inserts the psum gradient reduction.  Entry-range
chunked inference (inference.py:341-367) maps onto per-host event ranges with
the same mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a host batch with the leading axis sharded over ``data``.

    Jagged python-list entries (particles) are left on host — they only feed
    the host-side output writer.
    """
    sharding = data_sharding(mesh, axis_name)

    def put(x):
        if isinstance(x, np.ndarray):
            return jax.device_put(x, sharding)
        return x

    return {k: put(v) for k, v in batch.items()}

