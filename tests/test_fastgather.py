"""Tests for the native fused gather+normalize kernel (numpy equivalence)."""

import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.data import fastgather


@pytest.fixture(scope="module")
def native_available():
    return fastgather._load() is not None


def _numpy_ref(src, idx, flip=None):
    batch = src[idx].astype(np.float32) * (2.0 / 255.0) - 1.0
    if flip is not None:
        batch = np.where(flip[:, None, None, None], batch[:, :, ::-1, :], batch)
    return batch


def test_native_compiles(native_available):
    # this environment ships cc; the native path must be live here
    assert native_available


def test_gather_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, size=(100, 8, 8, 3), dtype=np.uint8)
    idx = rng.integers(0, 100, size=(32,))
    got = fastgather.gather_normalize(src, idx)
    npt.assert_allclose(got, _numpy_ref(src, idx), atol=1e-7)
    assert got.dtype == np.float32


def test_gather_normalize_flip_matches_numpy():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, size=(50, 6, 5, 3), dtype=np.uint8)
    idx = rng.integers(0, 50, size=(16,))
    flip = rng.random(16) < 0.5
    got = fastgather.gather_normalize(src, idx, flip)
    npt.assert_allclose(got, _numpy_ref(src, idx, flip), atol=1e-7)


def test_value_range():
    src = np.array([[[[0, 127, 255]]]], dtype=np.uint8)
    out = fastgather.gather_normalize(src, np.array([0]))
    npt.assert_allclose(out[0, 0, 0], [-1.0, 127 * 2 / 255 - 1, 1.0], atol=1e-7)


def test_uint8_data_module_uses_fused_path():
    from bsi_tpu.data import ArrayDataModule

    rng = np.random.default_rng(2)
    train = rng.integers(0, 256, size=(40, 4, 4, 3), dtype=np.uint8)
    val = rng.integers(0, 256, size=(8, 4, 4, 3), dtype=np.uint8)
    dm = ArrayDataModule(train, val, batch_size=8, train_eval_size=8, seed=0)
    batch = next(dm.train_batches())
    assert batch.dtype == np.float32
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    # eval path normalizes too
    b, m = next(dm.eval_batches(dm.eval_splits()["val"]))
    assert b.dtype == np.float32
