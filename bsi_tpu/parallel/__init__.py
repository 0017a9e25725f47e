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
from .sequence import apply_sequence_parallelism, token_stream_sharding

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "pad_to_multiple",
    "apply_sequence_parallelism",
    "token_stream_sharding",
]
