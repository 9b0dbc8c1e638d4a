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
    """Place a host batch dict onto the mesh, sharded over the batch axis.

    Single-controller: plain device_put with the global batch.  Multi-host:
    each host passes its PROCESS-LOCAL shard (batch_size x local devices) and
    the global array is assembled without replicating host data — the
    DistributedSampler+DDP input contract (tools/trainer.py:135-148)."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def maybe_initialize_distributed() -> bool:
    """Multi-controller init from env (the DDP launcher equivalent,
    tools/trainer.py:135-148 -> jax.distributed).

    Set GRLIR_COORDINATOR (host:port), GRLIR_NUM_PROCESSES and
    GRLIR_PROCESS_ID on every host — or rely on JAX's own cluster
    auto-detection env (SLURM, GKE, Cloud TPU metadata) by setting only
    GRLIR_DISTRIBUTED=1.  No-ops when neither is present (single-process),
    or when already initialized.  Returns True if distributed is active.
    """
    import os

    # NB: jax.process_count() would itself initialize the XLA backend, after
    # which distributed init is illegal — inspect the client state instead
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True
    coord = os.environ.get("GRLIR_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["GRLIR_NUM_PROCESSES"]),
            process_id=int(os.environ["GRLIR_PROCESS_ID"]),
        )
        return True
    if os.environ.get("GRLIR_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # cluster auto-detection
        return True
    return False
