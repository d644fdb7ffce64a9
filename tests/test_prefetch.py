"""utils/prefetch.py: threaded host->device batch prefetcher.

The prefetcher overlaps the host input chain with device compute in both the
training loop (training/loop.py) and validation encoding
(evaluation/validation.py::encode_loader); these tests pin its contract:
order-preserving, exception-propagating, promptly closeable, and degrading
to a synchronous generator at depth <= 0.
"""

import threading
import time

import pytest

pytestmark = pytest.mark.smoke

from peppa_tpu.utils.prefetch import Prefetcher


def test_yields_all_items_in_order():
    items = list(range(57))
    out = list(Prefetcher(iter(items), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in items]


def test_sync_mode_depth_zero_runs_on_consumer_thread():
    seen_threads = []

    def shard(x):
        seen_threads.append(threading.current_thread())
        return x

    out = list(Prefetcher(iter([1, 2, 3]), shard, depth=0))
    assert out == [1, 2, 3]
    assert all(t is threading.main_thread() for t in seen_threads)


def test_async_mode_runs_shard_fn_off_consumer_thread():
    seen_threads = []

    def shard(x):
        seen_threads.append(threading.current_thread())
        return x

    out = list(Prefetcher(iter([1, 2, 3]), shard, depth=2))
    assert out == [1, 2, 3]
    assert seen_threads and all(
        t is not threading.main_thread() for t in seen_threads)


def test_producer_exception_reraises_in_consumer():
    def bad_source():
        yield 1
        raise ValueError("decode failed")

    pf = Prefetcher(bad_source(), lambda x: x, depth=2)
    it = iter(pf)
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        list(it)


def test_shard_fn_exception_reraises_in_consumer():
    def shard(x):
        if x == 2:
            raise RuntimeError("device_put failed")
        return x

    with pytest.raises(RuntimeError, match="device_put failed"):
        list(Prefetcher(iter([1, 2, 3]), shard, depth=2))


def test_close_stops_worker_mid_stream():
    produced = []

    def source():
        for i in range(10_000):
            produced.append(i)
            yield i

    pf = Prefetcher(source(), lambda x: x, depth=2)
    it = iter(pf)
    assert next(it) == 0
    pf.close()
    # worker must exit promptly, well before draining the 10k source
    deadline = time.monotonic() + 5.0
    while pf._thread.is_alive() and time.monotonic() < deadline:
        time.sleep(0.01)
    assert not pf._thread.is_alive()
    assert len(produced) < 100


def test_close_on_sync_mode_is_noop():
    pf = Prefetcher(iter([1, 2]), lambda x: x, depth=0)
    pf.close()  # must not raise
    assert list(pf) == [1, 2]


def test_tuple_items_are_not_mistaken_for_errors():
    # internal error sentinel is a 2-tuple; real 2-tuple payloads must pass
    items = [(1, "a"), (2, "b")]
    out = list(Prefetcher(iter(items), lambda x: x, depth=2))
    assert out == items
