"""Host-side helper units: the streamed pipelines' one-ahead stripe
prefetcher (stream._prefetched) and the bench suite's resettable
peak-RSS reporting (bench._peak_rss_gb / _reset_peak_rss)."""

import sys
import threading
import time

import numpy as np
import pytest

from xmhw_tpu.stream import _prefetched


def test_prefetched_order_and_values():
    calls = []

    def fetch(lo, hi):
        calls.append((lo, hi))
        return lo * 100 + hi

    pairs = [(0, 3), (3, 7), (7, 9)]
    out = list(_prefetched(pairs, fetch))
    assert out == [(0, 3, 3), (3, 7, 307), (7, 9, 709)]
    assert calls == pairs  # each stripe fetched exactly once, in order


def test_prefetched_empty():
    assert list(_prefetched([], lambda lo, hi: None)) == []


def test_prefetched_single():
    assert list(_prefetched([(2, 5)], lambda lo, hi: hi - lo)) == [(2, 5, 3)]


def test_prefetched_error_surfaces_at_consumption():
    """A fetch failure on the worker thread re-raises when the consumer
    reaches that stripe — after the earlier stripes were yielded."""

    def fetch(lo, hi):
        if lo == 3:
            raise ValueError("stripe exploded")
        return lo

    got = []
    with pytest.raises(ValueError, match="stripe exploded"):
        for lo, hi, val in _prefetched([(0, 3), (3, 7), (7, 9)], fetch):
            got.append(val)
    assert got == [0]  # first stripe delivered before the failure


def test_prefetched_overlaps_fetch_with_consumption():
    """The next stripe's fetch runs while the consumer processes the
    current one: total wall ~ max-chain, not sum of both sides."""
    fetch_s, consume_s, n = 0.05, 0.05, 4

    def fetch(lo, hi):
        time.sleep(fetch_s)
        return lo

    t0 = time.perf_counter()
    for _lo, _hi, _v in _prefetched([(i, i + 1) for i in range(n)], fetch):
        time.sleep(consume_s)
    wall = time.perf_counter() - t0
    serial = n * (fetch_s + consume_s)
    # perfectly overlapped = fetch_s + n*consume_s; allow generous slack
    assert wall < serial - fetch_s  # must beat fully-serial by >=1 fetch


def test_prefetched_bounded_concurrency():
    """At most ONE fetch is in flight (memory bounded at two stripes)."""
    active = []
    peak = [0]
    lock = threading.Lock()

    def fetch(lo, hi):
        with lock:
            active.append(lo)
            peak[0] = max(peak[0], len(active))
        time.sleep(0.02)
        with lock:
            active.remove(lo)
        return lo

    for _ in _prefetched([(i, i + 1) for i in range(5)], fetch):
        pass
    assert peak[0] == 1


def _import_bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_peak_rss_helpers():
    bench = _import_bench()
    rss = bench._peak_rss_gb()
    assert 0 < rss < 1000
    if bench._reset_peak_rss():  # Linux with /proc/self/clear_refs
        after = bench._peak_rss_gb()
        # watermark resets to ~current RSS; never above the old peak
        assert 0 < after <= rss + 0.001
        # and a fresh allocation raises it again
        x = np.ones(int(50e6 // 8))  # ~50 MB
        x[::4096] = 2.0
        assert bench._peak_rss_gb() >= after
