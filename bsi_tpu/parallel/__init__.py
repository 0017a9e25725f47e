from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "pad_to_multiple",
]
