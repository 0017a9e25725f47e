"""FSDP-style parameter/optimizer sharding.

Beyond reference capability (the torch reference trains DiT-L with plain DDP,
SURVEY.md §2.8): sharding the train state's large leaves across the ``data``
mesh axis turns the jitted train step into a ZeRO-3-style program — XLA
inserts all-gathers for parameter use and reduce-scatters for gradients over
ICI automatically. Enable with ``trainer.fsdp: yes``; parameters, EMA, and
optimizer moments all shard, cutting per-chip state memory by the data-axis
size.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def assign_zero3_dim(spec: list, shape, axis_size: int, min_size: int) -> list:
    """Put DATA_AXIS on the largest free divisible dim of ``spec`` (in
    place) when the leaf is large enough — the single source of the ZeRO-3
    leaf policy, shared with the tensor-parallel composition
    (bsi_tpu/parallel/tensor.py)."""
    if not shape or int(np.prod(shape)) < min_size:
        return spec
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if spec[i] is None and shape[i] % axis_size == 0:
            spec[i] = DATA_AXIS
            break
    return spec


def _leaf_spec(leaf, axis_size: int, min_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    spec = assign_zero3_dim([None] * len(shape), shape, axis_size, min_size)
    return P(*spec)


def fsdp_state_sharding(state, mesh: Mesh, *, min_size: int = 2**14):
    """Per-leaf NamedShardings for a :class:`TrainState` pytree.

    Leaves smaller than ``min_size`` elements (biases, scalars, step counter,
    PRNG key) stay replicated; larger leaves shard their largest divisible
    axis over ``data``.
    """
    axis_size = mesh.shape[DATA_AXIS]

    def to_sharding(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf, axis_size, min_size))

    return jax.tree.map(to_sharding, state)
