"""Tests for index streams, exact-coverage eval sharding, and data modules."""

import numpy as np
import numpy.testing as npt
import pytest

from bsi_tpu.data import (
    InfiniteIndexStream,
    SyntheticDataModule,
    eval_shard,
    padded_batches,
)


def test_stream_covers_each_epoch():
    s = InfiniteIndexStream(10, seed=0)
    seen = s.next_indices(10)
    assert sorted(seen.tolist()) == list(range(10))
    seen2 = s.next_indices(10)
    assert sorted(seen2.tolist()) == list(range(10))
    # different epochs are shuffled differently
    assert not np.array_equal(seen, seen2)


def test_stream_sharding_is_disjoint_and_complete():
    shards = [InfiniteIndexStream(100, seed=3, shard_id=i, num_shards=4) for i in range(4)]
    all_idx = np.concatenate([s.next_indices(25) for s in shards])
    assert sorted(all_idx.tolist()) == list(range(100))


def test_stream_state_roundtrip():
    s = InfiniteIndexStream(17, seed=1)
    s.next_indices(10)
    state = s.state_dict()
    want = s.next_indices(20)

    s2 = InfiniteIndexStream(17, seed=1)
    s2.load_state_dict(state)
    got = s2.next_indices(20)
    npt.assert_array_equal(got, want)


def test_stream_shard_validation():
    with pytest.raises(ValueError):
        InfiniteIndexStream(10, seed=0, shard_id=4, num_shards=4)


def test_eval_shard_exact_coverage():
    parts = [eval_shard(11, i, 3) for i in range(3)]
    # no padding: sizes differ but union is exact
    assert sorted(np.concatenate(parts).tolist()) == list(range(11))
    assert sum(len(p) for p in parts) == 11


def test_padded_batches_masks():
    idx = np.arange(10)
    batches = list(padded_batches(idx, 4))
    assert len(batches) == 3
    for chunk, mask in batches:
        assert chunk.shape == (4,)
        assert mask.shape == (4,)
    total = sum(int(m.sum()) for _, m in batches)
    assert total == 10
    covered = np.concatenate([c[m] for c, m in batches])
    npt.assert_array_equal(np.sort(covered), idx)


def test_synthetic_module_shapes_and_quantization():
    dm = SyntheticDataModule(n_train=32, n_val=8, data_shape=(8, 8, 3), batch_size=16)
    assert dm.data_shape() == (8, 8, 3)
    batch = next(dm.train_batches())
    assert batch.shape == (16, 8, 8, 3)
    # data lies exactly on 8-bit bin centers
    levels = (batch + 1) / 2 * 255
    npt.assert_allclose(levels, np.round(levels), atol=1e-4)

    splits = dm.eval_splits()
    assert set(splits) == {"val", "train"}
    n_seen = 0
    for b, m in dm.eval_batches(splits["val"], batch_size=3):
        assert b.shape[0] == 3
        n_seen += int(m.sum())
    assert n_seen == 8


def test_module_state_roundtrip():
    dm = SyntheticDataModule(n_train=32, n_val=8, batch_size=8)
    it = dm.train_batches()
    next(it), next(it)
    state = dm.state_dict()
    want = next(it)

    dm2 = SyntheticDataModule(n_train=32, n_val=8, batch_size=8)
    dm2.load_state_dict(state)
    got = next(dm2.train_batches())
    npt.assert_array_equal(got, want)
