"""CIFAR-10 data module.

Equivalent of the reference's CIFAR10DataModule (bsi/data/cifar10.py:31-152):
reads the standard python-pickle batches (``cifar-10-batches-py`` directory or
``cifar-10-python.tar.gz``), caches the images NHWC/uint8 into one h5 file,
makes a deterministic 90/10 train/val split with a fixed seed, and serves a
fixed 5k train-eval subset as the second eval split. This environment has no
network egress, so the raw archive must already be present under ``root``.
"""

from __future__ import annotations

import pickle
import tarfile
from pathlib import Path
from typing import Optional

import numpy as np

from .base import ArrayDataModule

SPLIT_SEED = 387_241_991  # fixed, like the reference's hard-coded split seeds


def _load_pickle_batches(
    root: Path,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Return (train_images, train_labels, test_images, test_labels); images
    NHWC uint8, labels int16."""
    batches_dir = root / "cifar-10-batches-py"
    if not batches_dir.exists():
        tarball = root / "cifar-10-python.tar.gz"
        if tarball.exists():
            with tarfile.open(tarball) as tf:
                tf.extractall(root)
        else:
            raise FileNotFoundError(
                f"CIFAR-10 raw data not found: place cifar-10-python.tar.gz or the "
                f"extracted cifar-10-batches-py directory under {root} (this "
                f"environment cannot download it)"
            )

    def read(name):
        with open(batches_dir / name, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        # stored as [N, 3072] with CHW pixel order -> NHWC
        data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return np.ascontiguousarray(data), np.asarray(d[b"labels"], np.int16)

    parts = [read(f"data_batch_{i}") for i in range(1, 6)]
    train = np.concatenate([p[0] for p in parts])
    train_labels = np.concatenate([p[1] for p in parts])
    test, test_labels = read("test_batch")
    return train, train_labels, test, test_labels


class CIFAR10DataModule(ArrayDataModule):
    name = "cifar10"

    def __init__(
        self,
        root: str = "data/cifar10",
        *,
        batch_size: int = 128,
        eval_batch_size: Optional[int] = None,
        augment_flip: bool = False,
        val_fraction: float = 0.1,
        train_eval_size: int = 5000,
        preload: bool = True,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        import h5py

        root_path = Path(root)
        cache = root_path / "cifar10.h5"
        if not cache.exists():
            train_full, train_lab, test_arr, test_lab = _load_pickle_batches(root_path)
            root_path.mkdir(parents=True, exist_ok=True)
            with h5py.File(cache, "w") as f:
                # images + labels, like the reference's data/label cache
                # layout (bsi/data/h5image.py:26-35)
                f.create_dataset("train", data=train_full)
                f.create_dataset("train_label", data=train_lab)
                f.create_dataset("test", data=test_arr)
                f.create_dataset("test_label", data=test_lab)

        with h5py.File(cache, "r") as f:
            n_train_full = f["train"].shape[0]
            # labels are tiny; always resident (class-conditional extensions)
            self.train_full_labels = (
                f["train_label"][:] if "train_label" in f else None
            )
            self.test_labels = f["test_label"][:] if "test_label" in f else None

        # Deterministic 90/10 split, independent of the run seed so all hosts
        # and resumed runs agree (reference: bsi/data/cifar10.py:75)
        rng = np.random.default_rng(SPLIT_SEED)
        perm = rng.permutation(n_train_full)
        n_val = int(n_train_full * val_fraction)
        val_idx, train_idx = np.sort(perm[:n_val]), np.sort(perm[n_val:])
        if self.train_full_labels is not None:
            self.train_labels = self.train_full_labels[train_idx]
            self.val_labels = self.train_full_labels[val_idx]

        if preload:
            with h5py.File(cache, "r") as f:
                train_full = f["train"][:]
                test = f["test"][:]
            train, val = train_full[train_idx], train_full[val_idx]
        else:
            from .h5source import H5LazySource

            train = H5LazySource(cache, "train", subset=train_idx)
            val = H5LazySource(cache, "train", subset=val_idx)
            test = H5LazySource(cache, "test")

        super().__init__(
            train,
            val,
            test,
            train_eval_size=train_eval_size,
            batch_size=batch_size,
            eval_batch_size=eval_batch_size,
            seed=seed,
            augment_flip=augment_flip,
            shard_id=shard_id,
            num_shards=num_shards,
        )

    def data_shape(self) -> tuple[int, ...]:
        return (32, 32, 3)
