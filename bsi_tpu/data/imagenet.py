"""Downsampled ImageNet (32x32 / 64x64) data module.

Equivalent of the reference's ImageNetDataModule (bsi/data/imagenet.py):
reads the official downsampled-ImageNet ``.npz`` shards
(``Imagenet{n}_train_npz/train_data_batch_*.npz`` + ``Imagenet{n}_val_npz/
val_data.npz``), converts to NHWC uint8 into one h5 cache with fully
vectorized normalization-on-gather (the reference notes per-sample torch
transforms take hours vs minutes vectorized, bsi/data/imagenet.py:53-56),
and takes a deterministic 1% val split off the train set. The official val
set serves as the test split.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from .base import ArrayDataModule

SPLIT_SEED = 91_042_787


def _to_nhwc(flat: np.ndarray, n: int) -> np.ndarray:
    return np.ascontiguousarray(flat.reshape(-1, 3, n, n).transpose(0, 2, 3, 1))


def _build_cache(root: Path, n: int, cache: Path) -> None:
    import h5py

    train_dir = root / f"Imagenet{n}_train_npz"
    val_file = root / f"Imagenet{n}_val_npz" / "val_data.npz"
    shards = sorted(train_dir.glob("train_data_batch_*.npz"))
    if not shards or not val_file.exists():
        raise FileNotFoundError(
            f"Downsampled ImageNet{n} npz shards not found under {root} "
            f"(expected {train_dir}/train_data_batch_*.npz and {val_file}; "
            f"this environment cannot download them)"
        )
    with h5py.File(cache, "w") as f:
        total = 0
        dset = None
        lset = None
        for shard in shards:
            with np.load(shard) as z:
                imgs = _to_nhwc(z["data"].astype(np.uint8), n)
                labels = np.asarray(z["labels"], np.int16) if "labels" in z else None
            if dset is None:
                dset = f.create_dataset(
                    "train",
                    shape=(0, n, n, 3),
                    maxshape=(None, n, n, 3),
                    dtype=np.uint8,
                    chunks=(4096, n, n, 3),
                )
                if labels is not None:
                    # labels stored like the reference's data/label cache
                    # layout (bsi/data/h5image.py:26-35)
                    lset = f.create_dataset(
                        "train_label", shape=(0,), maxshape=(None,), dtype=np.int16
                    )
            dset.resize(total + len(imgs), axis=0)
            dset[total : total + len(imgs)] = imgs
            if lset is not None and labels is not None:
                lset.resize(total + len(labels), axis=0)
                lset[total : total + len(labels)] = labels
            total += len(imgs)
        with np.load(val_file) as z:
            f.create_dataset("test", data=_to_nhwc(z["data"].astype(np.uint8), n))
            if "labels" in z:
                f.create_dataset(
                    "test_label", data=np.asarray(z["labels"], np.int16)
                )


class ImageNetDataModule(ArrayDataModule):
    def __init__(
        self,
        root: str = "data/imagenet32",
        *,
        n: int = 32,
        batch_size: int = 128,
        eval_batch_size: Optional[int] = None,
        val_fraction: float = 0.01,
        train_eval_size: int = 5000,
        preload: bool = True,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        import h5py

        self.name = f"imagenet{n}"
        self.n = n
        root_path = Path(root)
        cache = root_path / f"imagenet{n}.h5"
        if not cache.exists():
            root_path.mkdir(parents=True, exist_ok=True)
            _build_cache(root_path, n, cache)

        with h5py.File(cache, "r") as f:
            n_train_full = f["train"].shape[0]
            self.train_full_labels = (
                f["train_label"][:] if "train_label" in f else None
            )
            self.test_labels = f["test_label"][:] if "test_label" in f else None

        rng = np.random.default_rng(SPLIT_SEED)
        perm = rng.permutation(n_train_full)
        n_val = int(n_train_full * val_fraction)
        val_idx, train_idx = np.sort(perm[:n_val]), np.sort(perm[n_val:])
        if self.train_full_labels is not None:
            self.train_labels = self.train_full_labels[train_idx]
            self.val_labels = self.train_full_labels[val_idx]

        if preload:
            with h5py.File(cache, "r") as f:
                train_full = f["train"][:]  # uint8, normalized on gather
                test = f["test"][:]
            train, val = train_full[train_idx], train_full[val_idx]
        else:
            # the reference's in_memory: no mode for ImageNet64
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
            shard_id=shard_id,
            num_shards=num_shards,
        )

    def data_shape(self) -> tuple[int, ...]:
        return (self.n, self.n, 3)
