from .base import ArrayDataModule, SyntheticDataModule
from .sampler import InfiniteIndexStream, eval_shard, padded_batches

__all__ = [
    "ArrayDataModule",
    "SyntheticDataModule",
    "InfiniteIndexStream",
    "eval_shard",
    "padded_batches",
]
