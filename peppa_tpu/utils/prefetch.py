"""Threaded host->device batch prefetch (see PERF.md round 2b).

One worker thread runs the host input chain (generate/decode -> collate ->
shard/device_put) and keeps up to `depth` already-sharded batches queued
while the consuming thread dispatches device steps.  On the tunneled host
this measured 7.9 -> 17.6 items/s on the run.py training loop with
bit-identical losses; on a real TPU host it hides decode/collate behind the
device step.  shard functions must use explicit shardings
(parallel/mesh.py::shard_batch does), making them safe off the main thread.

Device-session recycling (utils/host_memory.py) invalidates every live
device buffer, including batches sitting in this queue.  Each queued item
therefore keeps its HOST batch alongside the sharded one, tagged with a
generation number: `recycling()` freezes the worker (no device_put may run
concurrently with the session reset), the caller recycles its state, and
stale-generation items are re-sharded transparently on dequeue.
"""

from __future__ import annotations

import contextlib


class Prefetcher:
    """Overlap host batch production + device transfer with device compute.

    One worker thread runs the (decode/collate/shard-device_put) chain and
    keeps up to `depth` already-sharded batches queued while the training
    thread dispatches steps — on a remote/tunneled device the transfer is
    the dominant per-step host cost, and it is fully hidden behind the
    previous step's execution.  `shard_batch` uses explicit NamedShardings,
    so it is safe off the main thread.  depth <= 0 degrades to synchronous.
    Worker exceptions re-raise in the consumer; `close()` stops the worker
    promptly when the loop exits an epoch early (max_steps/max_time).
    """

    _END = object()
    _ERR = object()

    def __init__(self, batches, shard_fn, depth: int):
        import queue
        import threading

        self._shard_fn = shard_fn
        self._gen = 0
        self._lock = threading.Lock()
        self._sync = depth <= 0
        if self._sync:
            self._it = iter(batches)
            return
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def work():
            try:
                for b in batches:
                    # shard under the lock: a device_put concurrent with a
                    # session reset is undefined; recycling() excludes us
                    with self._lock:
                        gen = self._gen
                        sharded = shard_fn(b)
                    while not self._stop.is_set():
                        try:
                            self._q.put((gen, b, sharded), timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._q.put((self._ERR, e))
                return
            self._q.put(self._END)

        self._thread = threading.Thread(target=work, daemon=True,
                                        name="batch-prefetch")
        self._thread.start()

    @contextlib.contextmanager
    def recycling(self):
        """Freeze transfers while the caller resets the device session.

        Usage: `with prefetcher.recycling(): state = recycler.recycle(state)`.
        Queued batches sharded before the reset are re-transferred from
        their host copies when dequeued.
        """
        with self._lock:
            yield
            self._gen += 1

    def __iter__(self):
        if self._sync:
            for b in self._it:
                # shard under the lock, but NEVER yield while holding it —
                # the consumer calls recycling() from this same thread
                with self._lock:
                    sharded = self._shard_fn(b)
                yield sharded
            return
        while True:
            item = self._q.get()
            if item is self._END:
                return
            if isinstance(item, tuple) and len(item) == 2 \
                    and item[0] is self._ERR:
                raise item[1]
            gen, host_batch, sharded = item
            if gen != self._gen:
                # sharded before a session recycle: those device buffers
                # died with the session — re-transfer from the host copy
                with self._lock:
                    sharded = self._shard_fn(host_batch)
            yield sharded

    def close(self):
        if self._sync:
            return
        self._stop.set()
        # unblock a worker stuck on a full queue, then let it exit
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5.0)
