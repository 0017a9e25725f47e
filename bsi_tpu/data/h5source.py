"""Lazy h5-backed data source (the reference's ``preload: no`` path).

Equivalent of the reference's on-demand h5 reading (bsi/data/h5image.py:23-62
+ the ``in_memory: no`` datamodule mode used for ImageNet64): rows are read
from the h5 file per batch instead of preloading the whole set into RAM.
h5py fancy indexing requires sorted unique indices, so gathers go through a
``np.unique`` + inverse-permutation round trip like the reference's
``H5FileReader``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


class H5LazySource:
    """Array-like view over one h5 dataset, optionally restricted to a subset
    of row indices (used for train/val splits of one underlying dataset)."""

    def __init__(self, path: str | Path, name: str, subset: Optional[np.ndarray] = None):
        import h5py

        self._file = h5py.File(path, "r")
        self._dset = self._file[name]
        self._subset = None if subset is None else np.asarray(subset, np.int64)

    @property
    def dtype(self):
        return self._dset.dtype

    @property
    def shape(self):
        n = len(self._subset) if self._subset is not None else self._dset.shape[0]
        return (n,) + self._dset.shape[1:]

    def __len__(self) -> int:
        return self.shape[0]

    def __getitem__(self, idx) -> np.ndarray:
        idx = np.atleast_1d(np.asarray(idx, np.int64))
        if self._subset is not None:
            idx = self._subset[idx]
        # h5py wants increasing unique indices
        unique, inverse = np.unique(idx, return_inverse=True)
        rows = self._dset[unique]
        return rows[inverse]

    def subset(self, indices: np.ndarray) -> "H5LazySource":
        base = indices if self._subset is None else self._subset[indices]
        src = H5LazySource.__new__(H5LazySource)
        src._file = self._file
        src._dset = self._dset
        src._subset = np.asarray(base, np.int64)
        return src
