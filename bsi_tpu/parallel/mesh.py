"""Device mesh and sharding helpers.

The reference's distribution story is single-axis data parallelism over NCCL
(SURVEY.md §2.8). The TPU-native posture: one ``jax.sharding.Mesh`` with a
``data`` axis over ICI; parameters and optimizer state replicated, batches
sharded on ``data``. Gradient reduction is inserted by XLA when the jitted
step's outputs are replicated — the DDP-allreduce analogue with zero
framework code in the hot path.

A ``model`` axis is provisioned for tensor-parallel sharding of wide layers
(beyond reference capability; unused by default).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallelism: int = 1,
) -> Mesh:
    """Create a ``(data, model)`` mesh over the available devices.

    With ``model_parallelism=1`` (default) this is pure data parallelism.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallelism:
        raise ValueError(f"{n} devices not divisible by model_parallelism={model_parallelism}")
    grid = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch) -> jax.Array:
    """Device-put a host batch with the leading axis sharded over ``data``.

    The per-host analogue of the reference's rank-strided samplers
    (bsi/data/sampler.py): each host only needs to materialize its own shard
    when running multi-host; single-host, XLA splits the array across local
    devices.
    """
    return jax.device_put(batch, batch_sharding(mesh))


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
