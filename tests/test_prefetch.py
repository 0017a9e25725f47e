"""Tests for the device prefetcher utility."""

import time

import numpy as np
import pytest

from bsi_tpu.data.prefetch import DevicePrefetcher


def test_prefetcher_order_and_depth():
    produced = []

    def gen():
        for i in range(10):
            produced.append(i)
            yield i

    pf = DevicePrefetcher(gen(), lambda x: x * 2, depth=2)
    got = [next(pf) for _ in range(10)]
    assert got == [2 * i for i in range(10)]
    pf.close()


def test_prefetcher_runs_ahead():
    def slow_consumer_gen():
        for i in range(6):
            yield i

    pf = DevicePrefetcher(slow_consumer_gen(), lambda x: x, depth=3)
    time.sleep(0.2)  # worker should fill the queue while we sleep
    assert pf._queue.qsize() >= 2
    assert next(pf) == 0
    pf.close()


def test_prefetcher_propagates_errors():
    def bad_gen():
        yield 1
        raise ValueError("boom")

    pf = DevicePrefetcher(bad_gen(), lambda x: x, depth=2)
    assert next(pf) == 1
    with pytest.raises(ValueError, match="boom"):
        next(pf)
