"""Device mesh and sharding helpers.

The reference's only device parallelism is single-process
``torch.nn.DataParallel`` (train.py:234) plus a serial sliding-window loop at
inference.  The TPU-native replacement is SPMD over a
``jax.sharding.Mesh``: window batches and training batches are sharded along
a ``data`` axis; XLA inserts the ICI collectives (psum for gradients,
all-gather for mask stitching).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
