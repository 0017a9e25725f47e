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


def _leaf_spec(leaf, axis_size: int, min_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    # shard the largest divisible axis
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % axis_size == 0:
            spec = [None] * len(shape)
            spec[i] = DATA_AXIS
            return P(*spec)
    return P()


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
