"""Multi-host launch initialization (torchx/.torchxconfig equivalent).

The reference launches N DDP processes via torchx `dist.ddp`
(.torchxconfig:1-7) which sets the NCCL process group.  TPU-native: one
process per host, `jax.distributed.initialize` wires the slice; collectives
then ride ICI in-slice / DCN across slices via the mesh (SURVEY.md §2.7).

Usage:
    from grlir.parallel.launch import init_distributed
    init_distributed()          # no-op on single host / TPU auto-detection
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed if a multi-host environment is detected.

    On Cloud TPU, jax.distributed.initialize() auto-detects everything.
    Elsewhere, pass or set GRLIR_COORDINATOR / GRLIR_NUM_PROCESSES /
    GRLIR_PROCESS_ID.
    """
    import jax

    coordinator = coordinator or os.environ.get("GRLIR_COORDINATOR")
    num_processes = num_processes or _int_env("GRLIR_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env(
        "GRLIR_PROCESS_ID")

    tpu_env = any(k in os.environ for k in
                  ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator is None and not tpu_env:
        return  # single host

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def per_host_batch(global_batch: int) -> int:
    """Shard the global batch across hosts (each host feeds its local slice of
    the data mesh axis; global batch = num_hosts * per_host, mirroring the
    reference's num_nodes*gpus*batch_size arithmetic, utils_train.py:29-33)."""
    import jax

    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
