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


def test_padded_batches_fixed_count_lockstep():
    """num_batches pads with fully-masked batches so unevenly sharded hosts
    iterate the same number of SPMD eval steps."""
    short = list(padded_batches(np.arange(3), 4, num_batches=3))
    assert len(short) == 3
    assert short[0][1].sum() == 3 and short[1][1].sum() == 0 and short[2][1].sum() == 0
    assert all(b.shape == (4,) for b, _ in short)
    empty = list(padded_batches(np.arange(0), 4, num_batches=1))
    assert len(empty) == 1 and empty[0][1].sum() == 0


def test_multi_shard_batch_divisibility_guard():
    from bsi_tpu.data import SyntheticDataModule

    with pytest.raises(ValueError, match="divisible"):
        SyntheticDataModule(n_train=32, n_val=8, batch_size=17, shard_id=0, num_shards=2)


def test_eval_batches_lockstep_across_shards():
    """All shards of a ragged split yield the same number of eval batches and
    together cover each example exactly once."""
    from bsi_tpu.data import SyntheticDataModule

    n_val = 9  # 3 shards -> shard sizes 3/3/3; use 10 -> 4/3/3
    for n_val in (9, 10, 4):
        mods = [
            SyntheticDataModule(
                n_train=32, n_val=n_val, batch_size=6, shard_id=i, num_shards=3
            )
            for i in range(3)
        ]
        split_counts = []
        covered = 0
        for dm in mods:
            batches = list(dm.eval_batches(dm.eval_splits()["val"]))
            split_counts.append(len(batches))
            covered += sum(int(m.sum()) for _, m in batches)
            assert all(b.shape[0] == 2 for b, _ in batches)  # 6 global / 3 shards
        assert len(set(split_counts)) == 1, split_counts
        assert covered == n_val


def test_put_host_batch_validates_global_batch():
    import jax

    from bsi_tpu.parallel import make_mesh
    from bsi_tpu.parallel.distributed import put_host_batch

    mesh = make_mesh(4)
    batch = np.ones((8, 3), np.float32)
    out = put_host_batch(mesh, batch, global_batch=8)
    assert out.shape == (8, 3)
    with pytest.raises(ValueError, match="global_batch"):
        put_host_batch(mesh, batch, global_batch=16)
