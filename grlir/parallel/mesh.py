"""Device mesh and sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL
(tools/trainer.py:135-148).  TPU-native equivalent: a 1-D ``data`` mesh; the
train step is jitted with the batch sharded over that axis and params/opt-state
replicated — XLA inserts the gradient all-reduce over ICI (SURVEY.md §2.7).

A second optional ``tile`` axis spatially shards large-image tiled inference
across devices (the moral equivalent of sequence parallelism for this workload).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch dict onto the mesh, sharded over the batch axis."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
