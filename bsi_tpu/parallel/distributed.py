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


_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX when running on more than one host.

    No-ops in single-process settings. On TPU pods the arguments are
    auto-detected from the environment; explicit values support DCN/GPU-style
    setups (``JAX_COORDINATOR_ADDRESS`` etc. also respected).

    CRITICAL ORDERING: multi-process-ness is decided from the environment
    ALONE — no ``jax.*`` call happens before ``jax.distributed.initialize``,
    because any JAX API touch (even ``jax.process_count()``) instantiates the
    local XLA backend, after which distributed initialization fails. This is
    the one code path a real TPU pod takes through ``train.py``.
    """
    global _initialized
    if _initialized:
        return
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    auto_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") >= 1
    if explicit or auto_tpu_pod:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True


def host_shard() -> tuple[int, int]:
    """(shard_id, num_shards) for host-side data sharding."""
    return jax.process_index(), jax.process_count()


def put_host_batch(
    mesh,
    batch: np.ndarray,
    *,
    global_batch: Optional[int] = None,
    batch_axis: int = 0,
):
    """Transfer this host's batch shard into a globally data-sharded array.

    Single-process: a plain sharded ``device_put``. Multi-process: assembles
    the global array from per-process local shards. Every host MUST hold
    exactly ``global_batch / num_hosts`` rows — sharded global arrays require
    equal per-process shards, so the reference's remainder-distributing rank
    split (bsi/data/h5image.py:308-312) is replaced by a divisibility
    contract, enforced here and at data-module construction with actionable
    errors. Pass ``global_batch`` to validate the local shard against the
    configured global batch size instead of trusting shape inference.

    ``batch_axis`` selects which axis carries the data-sharded batch
    dimension (axis 1 for gradient-accumulation batches ``[accum, micro,
    ...]``, whose leading accumulation axis is unsharded scan input).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*([None] * batch_axis + ["data"]))
    sharding = NamedSharding(mesh, spec)
    n_proc = jax.process_count()
    local_rows = int(np.prod(batch.shape[: batch_axis + 1]))
    if global_batch is not None and local_rows * n_proc != global_batch:
        raise ValueError(
            f"host shard of {local_rows} rows x {n_proc} processes = "
            f"{local_rows * n_proc} rows, but the configured global batch is "
            f"{global_batch}; multi-host batches must be equal per host "
            f"(global_batch % num_hosts == 0)"
        )
    if n_proc == 1:
        return jax.device_put(batch, sharding)
    global_shape = (
        batch.shape[:batch_axis]
        + (batch.shape[batch_axis] * n_proc,)
        + batch.shape[batch_axis + 1 :]
    )
    return jax.make_array_from_process_local_data(sharding, batch, global_shape)
