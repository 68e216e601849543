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
