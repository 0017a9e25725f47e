from .base import ArrayDataModule, SyntheticDataModule
from .cifar10 import CIFAR10DataModule
from .imagenet import ImageNetDataModule
from .prefetch import DevicePrefetcher
from .sampler import InfiniteIndexStream, eval_shard, padded_batches

__all__ = [
    "ArrayDataModule",
    "SyntheticDataModule",
    "CIFAR10DataModule",
    "ImageNetDataModule",
    "DevicePrefetcher",
    "InfiniteIndexStream",
    "eval_shard",
    "padded_batches",
]
