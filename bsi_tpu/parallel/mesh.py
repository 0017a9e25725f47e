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
PIPE_AXIS = "pipe"


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallelism: int = 1,
    pipeline_parallelism: int = 1,
    dcn_data_parallelism: int = 1,
) -> Mesh:
    """Create a ``(data[, pipe], model)`` mesh over the available devices.

    With ``model_parallelism=1`` (default) this is pure data parallelism.
    ``pipeline_parallelism > 1`` inserts a ``pipe`` axis between ``data``
    and ``model`` (bsi_tpu/parallel/pipeline.py shards stacked transformer
    blocks over it); the axis is omitted entirely when 1 so existing
    two-axis PartitionSpecs stay valid.

    ``dcn_data_parallelism > 1`` targets multi-slice TPU (slices connected
    over DCN rather than ICI): the ``data`` axis is laid out with the
    cross-slice factor OUTERMOST, so model/pipe collectives and the FSDP
    all-gather/reduce-scatter ride ICI inside a slice and only the gradient
    all-reduce's top reduction tier crosses DCN — the standard
    DP-across-slices recipe. On real multi-slice hardware the layout comes
    from ``mesh_utils.create_hybrid_device_mesh`` (slice-aware device
    order); elsewhere (single slice, CPU simulation) devices are grouped
    contiguously, which is the same SPMD program.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    per_replica = model_parallelism * pipeline_parallelism
    if n % (per_replica * dcn_data_parallelism):
        raise ValueError(
            f"{n} devices not divisible by model_parallelism={model_parallelism}"
            f" x pipeline_parallelism={pipeline_parallelism}"
            f" x dcn_data_parallelism={dcn_data_parallelism}"
        )
    pipe_dims = (pipeline_parallelism,) if pipeline_parallelism > 1 else ()
    axis_names = (
        (DATA_AXIS, PIPE_AXIS, MODEL_AXIS)
        if pipeline_parallelism > 1
        else (DATA_AXIS, MODEL_AXIS)
    )
    ici_data = n // (per_replica * dcn_data_parallelism)
    if dcn_data_parallelism > 1:
        grid = _hybrid_grid(
            devices,
            ici_shape=(ici_data, *pipe_dims, model_parallelism),
            dcn_shape=(dcn_data_parallelism,) + (1,) * (1 + len(pipe_dims)),
        )
        return Mesh(grid, axis_names)
    grid = np.asarray(devices).reshape(ici_data, *pipe_dims, model_parallelism)
    return Mesh(grid, axis_names)


def _hybrid_grid(devices, *, ici_shape, dcn_shape) -> np.ndarray:
    """Slice-aware device grid for multi-slice meshes.

    Uses ``mesh_utils.create_hybrid_device_mesh`` when the devices expose a
    ``slice_index`` (real multi-slice TPU: it orders devices so the DCN
    factor of each axis is outermost and ICI-neighbouring devices stay
    adjacent). Falls back to contiguous grouping — identical SPMD program,
    only the physical device order differs — when they don't (single slice,
    CPU simulation).
    """
    dev = list(devices)
    if len({getattr(d, "slice_index", 0) for d in dev}) > 1:
        from jax.experimental import mesh_utils

        return mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=dev
        )
    merged = tuple(i * d for i, d in zip(ici_shape, dcn_shape))
    return np.asarray(dev).reshape(merged)


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
