"""Tests for the lazy h5 source, the CIFAR-10 pipeline (fake raw data), and
train.py sweep expansion."""

import pickle
import sys
from pathlib import Path

import h5py
import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.data.h5source import H5LazySource

REPO = Path(__file__).parent.parent


@pytest.fixture()
def h5file(tmp_path):
    path = tmp_path / "data.h5"
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(40, 4, 4, 3), dtype=np.uint8)
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=arr)
    return path, arr


def test_lazy_source_gather(h5file):
    path, arr = h5file
    src = H5LazySource(path, "train")
    assert src.shape == arr.shape
    assert len(src) == 40
    # unsorted + duplicate indices (the reference's np.unique handling)
    idx = np.array([5, 3, 5, 39, 0, 3])
    npt.assert_array_equal(src[idx], arr[idx])


def test_lazy_source_subset(h5file):
    path, arr = h5file
    subset_idx = np.array([2, 7, 11, 30])
    src = H5LazySource(path, "train", subset=subset_idx)
    assert len(src) == 4
    npt.assert_array_equal(src[np.array([1, 3])], arr[[7, 30]])
    nested = src.subset(np.array([0, 2]))
    npt.assert_array_equal(nested[np.array([1])], arr[[11]])


@pytest.fixture()
def fake_cifar_root(tmp_path):
    batches = tmp_path / "cifar-10-batches-py"
    batches.mkdir(parents=True)
    rng = np.random.default_rng(1)

    def write(name, n):
        data = {
            b"data": rng.integers(0, 256, size=(n, 3072), dtype=np.uint8),
            b"labels": rng.integers(0, 10, size=(n,)).tolist(),
        }
        (batches / name).write_bytes(pickle.dumps(data))

    for i in range(1, 6):
        write(f"data_batch_{i}", 20)
    write("test_batch", 10)
    return tmp_path


@pytest.mark.parametrize("preload", [True, False])
def test_cifar10_pipeline(fake_cifar_root, preload):
    from bsi_tpu.data import CIFAR10DataModule

    dm = CIFAR10DataModule(
        root=str(fake_cifar_root), batch_size=8, train_eval_size=8, preload=preload,
        seed=0,
    )
    assert dm.data_shape() == (32, 32, 3)
    batch = next(dm.train_batches())
    assert batch.shape == (8, 32, 32, 3) and batch.dtype == np.float32
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    splits = dm.eval_splits()
    assert len(splits["val"]) == 10  # 10% of 100
    b, m = next(dm.eval_batches(splits["val"], batch_size=4))
    assert b.dtype == np.float32 and b.shape == (4, 32, 32, 3)
    # labels land in the cache and split consistently with the images
    # (reference cache layout: bsi/data/h5image.py:26-35)
    assert dm.train_labels.shape == (90,) and dm.val_labels.shape == (10,)
    assert dm.test_labels.shape == (10,)
    assert set(np.unique(dm.train_full_labels)) <= set(range(10))
    import h5py

    with h5py.File(fake_cifar_root / "cifar10.h5", "r") as f:
        assert f["train_label"].shape == (100,)
        assert f["test_label"].shape == (10,)


def test_cifar10_modes_identical(fake_cifar_root):
    from bsi_tpu.data import CIFAR10DataModule

    batches = {}
    for preload in (True, False):
        dm = CIFAR10DataModule(
            root=str(fake_cifar_root), batch_size=8, train_eval_size=8,
            preload=preload, seed=0,
        )
        batches[preload] = next(dm.train_batches())
    npt.assert_allclose(batches[True], batches[False], atol=1e-7)


def test_sweep_expansion():
    sys.path.insert(0, str(REPO))
    import train as train_cli
    from bsi_tpu.config import ConfigLoader

    loader = ConfigLoader(REPO / "configs")
    runs = train_cli.expand_sweep(loader, ["data=synthetic", "seed=1,2", "task=bsi,vdm"])
    assert len(runs) == 4
    assert ["data=synthetic", "seed=1", "task=bsi"] in runs
    assert ["data=synthetic", "seed=2", "task=vdm"] in runs
    # bracketed values are not comma-split
    runs = train_cli.expand_sweep(
        loader, ["data=synthetic", "task.optimizer.betas=[0.9,0.99]"]
    )
    assert len(runs) == 1
    # config sweep tables expand; CLI sweep of the same key wins
    runs = train_cli.expand_sweep(loader, ["experiment=imagenet32"])
    assert len(runs) == 9  # 3 seeds x 3 tasks
    runs = train_cli.expand_sweep(loader, ["experiment=imagenet32", "task=bsi,vdm"])
    assert len(runs) == 6  # 2 tasks x 3 seeds
