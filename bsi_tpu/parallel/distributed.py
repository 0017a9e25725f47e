"""Multi-host (multi-process) initialization and host-sharded data transfer.

The reference's distribution is torch.distributed/NCCL rank plumbing
(SURVEY.md §5.8). The JAX equivalent: ``jax.distributed.initialize`` links
the hosts of a TPU pod (or multi-slice via DCN); each host then feeds its
shard of the global batch and the single jitted step runs SPMD over the
global mesh with XLA collectives over ICI/DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX when running on more than one host.

    No-ops in single-process settings. On TPU pods the arguments are
    auto-detected from the environment; explicit values support DCN/GPU-style
    setups (``JAX_COORDINATOR_ADDRESS`` etc. also respected).
    """
    if jax.process_count() > 1:
        return  # already initialized
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1
    if explicit or auto_tpu_pod:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )


def host_shard() -> tuple[int, int]:
    """(shard_id, num_shards) for host-side data sharding."""
    return jax.process_index(), jax.process_count()


def put_host_batch(mesh, batch: np.ndarray):
    """Transfer this host's batch shard into a globally data-sharded array.

    Single-process: a plain sharded ``device_put``. Multi-process: assembles
    the global array from per-process local shards (each host holds
    ``global_batch / num_hosts`` rows; the global shape is inferred).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    global_shape = (batch.shape[0] * jax.process_count(),) + batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, batch, global_shape)
