"""Asynchronous batch pipeline — the thread-pool equivalent.

The reference threads per-block jobs through a shared worker pool with
serial-number-ordered result queues (thread_pool.c:518, bgzf.c:1598).
Here the pipeline stages are *batch* functions (inflate a chunk of
blocks, decode a chunk of records) run ahead on an executor with a
bounded in-flight window — order is the submission order, and
back-pressure comes from the window size (the in/out queue limits of
hts_tpool_process, thread_pool_internal.h:106).
"""
from __future__ import annotations

import concurrent.futures as _fut
from collections import deque
from typing import Callable, Iterator, Iterable, Optional, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_shared_pool: Optional[_fut.ThreadPoolExecutor] = None


def shared_pool(max_workers: Optional[int] = None) -> _fut.ThreadPoolExecutor:
    """One process-wide pool shared by all streams (the hts_set_thread_pool
    model, hts.c:1934)."""
    global _shared_pool
    if _shared_pool is None:
        import os
        _shared_pool = _fut.ThreadPoolExecutor(
            max_workers=max_workers or os.cpu_count() or 2)
    return _shared_pool


def pipeline_map(fn: Callable[[T], U], items: Iterable[T],
                 window: int = 4,
                 pool: Optional[_fut.ThreadPoolExecutor] = None,
                 ) -> Iterator[U]:
    """Ordered map with up-to-`window` tasks in flight (the ordered
    hts_tpool_next_result_wait drain, thread_pool.c:224)."""
    pool = pool or shared_pool()
    pending: deque = deque()
    it = iter(items)
    try:
        for item in it:
            pending.append(pool.submit(fn, item))
            if len(pending) >= window:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()
    finally:
        for f in pending:
            f.cancel()


def chunked_bgzf_batches(path: str, blocks_per_batch: int = 256,
                         window: int = 3) -> Iterator[bytes]:
    """Stream a BGZF file as uncompressed chunks, inflating batches of
    blocks ahead of the consumer (the bgzf_mt_reader decode-ahead,
    bgzf.c:1598, reformulated as batch prefetch)."""
    import numpy as np

    from htslib_tpu.bgzf import inflate_blocks, scan_blocks

    raw = np.fromfile(path, dtype=np.uint8)
    table = scan_blocks(raw)
    n = table.n
    spans = []
    for s in range(0, n, blocks_per_batch):
        e = min(s + blocks_per_batch, n)
        c0 = int(table.coffsets[s])
        c1 = (int(table.coffsets[e - 1]) + int(table.csizes[e - 1]))
        spans.append((c0, c1))

    def inflate(span):
        c0, c1 = span
        out, _ = inflate_blocks(raw[c0:c1])
        return out.tobytes()

    return pipeline_map(inflate, spans, window=window)


class QueueFull(Exception):
    """Non-blocking dispatch refused: the input side is at its limit
    (hts_tpool_dispatch3's nonblock path returning EAGAIN)."""


class ProcessQueue:
    """hts_tpool_process equivalent (thread_pool.c:725-956): a
    per-stream queue attached to the shared pool with bounded input and
    output sides, non-blocking dispatch, and serial-number-ordered
    result draining.  Many queues can share one pool
    (hts_tpool_attach model)."""

    def __init__(self, pool: Optional[_fut.ThreadPoolExecutor] = None,
                 in_limit: int = 8, out_limit: int = 8):
        import threading
        self._pool = pool or shared_pool()
        self._in_limit = max(1, in_limit)
        self._out_limit = max(1, out_limit)
        self._lock = threading.Condition()
        self._next_serial = 0        # next serial to assign
        self._next_out = 0           # next serial to hand to the consumer
        self._in_flight = 0
        self._results: dict = {}
        self._shutdown = False

    # -- producer side --------------------------------------------------
    def _submit(self, fn, args, kwargs) -> None:
        serial = self._next_serial
        self._next_serial += 1
        self._in_flight += 1

        def run():
            try:
                res = fn(*args, **kwargs)
                err = None
            except Exception as e:      # propagated to the consumer
                res, err = None, e
            with self._lock:
                # block while the output side is full, unless this
                # result is the one the consumer is waiting for
                while (len(self._results) >= self._out_limit
                       and serial != self._next_out
                       and not self._shutdown):
                    self._lock.wait(1.0)
                self._results[serial] = (res, err)
                self._in_flight -= 1
                self._lock.notify_all()

        self._pool.submit(run)

    def dispatch(self, fn, *args, **kwargs) -> None:
        """Blocking dispatch: waits while the input side is full
        (hts_tpool_dispatch)."""
        with self._lock:
            while self._in_flight >= self._in_limit and not self._shutdown:
                self._lock.wait(1.0)
            if self._shutdown:
                raise RuntimeError("queue is shut down")
            self._submit(fn, args, kwargs)

    def try_dispatch(self, fn, *args, **kwargs) -> bool:
        """Non-blocking dispatch (hts_tpool_dispatch3 nonblock):
        returns False instead of waiting when the input side is full."""
        with self._lock:
            if self._shutdown:
                raise RuntimeError("queue is shut down")
            if self._in_flight >= self._in_limit:
                return False
            self._submit(fn, args, kwargs)
            return True

    # -- consumer side --------------------------------------------------
    def next_result(self, wait: bool = True):
        """The next result in dispatch order (hts_tpool_next_result
        / _wait).  Returns None when nothing is pending and wait is
        False; raises the task's exception if it failed."""
        with self._lock:
            while True:
                if self._next_out in self._results:
                    res, err = self._results.pop(self._next_out)
                    self._next_out += 1
                    self._lock.notify_all()
                    if err is not None:
                        raise err
                    return res
                if not wait:
                    return None
                if (self._next_out >= self._next_serial
                        and self._in_flight == 0):
                    return None          # fully drained
                self._lock.wait(1.0)

    def flush(self):
        """Drain every outstanding result in order (hts_tpool_process_
        flush + drain)."""
        out = []
        while True:
            with self._lock:
                done = (self._next_out >= self._next_serial
                        and self._in_flight == 0
                        and not self._results)
            if done:
                return out
            r = self.next_result(wait=True)
            if r is None and self._next_out >= self._next_serial:
                return out
            out.append(r)

    def shutdown(self):
        with self._lock:
            self._shutdown = True
            self._lock.notify_all()
