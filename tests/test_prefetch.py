"""Unit tests for the host-pipeline prefetcher (data/prefetch.py)."""

import threading
import time

import pytest

from agile3d_tpu.data.prefetch import BatchPrefetcher


def test_ordered_delivery():
    out = list(BatchPrefetcher(lambda x: x * 2, range(20), depth=3))
    assert out == [x * 2 for x in range(20)]


def test_depth_zero_is_synchronous():
    calls = []

    def fn(x):
        calls.append(x)
        return x

    pf = BatchPrefetcher(fn, range(5), depth=0)
    assert calls == []  # nothing runs until iteration
    it = iter(pf)
    assert next(it) == 0 and calls == [0]
    assert list(it) == [1, 2, 3, 4]


def test_error_propagates():
    def fn(x):
        if x == 3:
            raise ValueError("boom")
        return x

    with pytest.raises(ValueError, match="boom"):
        list(BatchPrefetcher(fn, range(6), depth=2))


def test_depth_bounds_inflight():
    """At most `depth` results may be prepared beyond the consumed ones."""
    max_ahead = 0
    consumed = 0
    lock = threading.Lock()

    def fn(x):
        nonlocal max_ahead
        with lock:
            max_ahead = max(max_ahead, x - consumed)
        return x

    pf = BatchPrefetcher(fn, range(12), depth=2)
    for r in pf:
        time.sleep(0.01)  # let the worker run ahead as far as it can
        with lock:
            consumed = r + 1
    assert max_ahead <= 2, f"worker ran {max_ahead} items ahead"


def test_overlap_actually_happens():
    """With depth>0 the worker prepares item N+1 while the consumer holds
    item N."""
    prepared = []

    def fn(x):
        prepared.append(x)
        return x

    pf = BatchPrefetcher(fn, range(4), depth=2)
    it = iter(pf)
    first = next(it)
    time.sleep(0.1)
    assert first == 0
    assert len(prepared) >= 2  # the worker kept going in the background
    assert list(it) == [1, 2, 3]


def test_close_unblocks_workers():
    pf = BatchPrefetcher(lambda x: x, range(100), depth=1)
    it = iter(pf)
    next(it)
    pf.close()
    pf.close()  # idempotent
