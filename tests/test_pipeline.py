"""Pipeline + generic-open tests (thread-pool P2 equivalent + htsFile
facade)."""
import os

import pytest

from htslib_tpu.hts import hts_open
from htslib_tpu.pipeline import chunked_bgzf_batches, pipeline_map
from tests.conftest import ref_path, has_ref


def test_pipeline_map_order_and_window():
    import threading
    in_flight = 0
    max_in_flight = 0
    lock = threading.Lock()

    def work(x):
        nonlocal in_flight, max_in_flight
        with lock:
            in_flight += 1
            max_in_flight = max(max_in_flight, in_flight)
        import time
        time.sleep(0.002)
        with lock:
            in_flight -= 1
        return x * x

    out = list(pipeline_map(work, range(50), window=4))
    assert out == [x * x for x in range(50)]
    assert max_in_flight <= 4 + 2  # pool may briefly overlap drains


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_chunked_bgzf_batches_match_plain_read():
    from htslib_tpu.bgzf import BGZFReader
    with BGZFReader(ref_path("range.bam")) as r:
        want = r.read(-1)
    got = b"".join(chunked_bgzf_batches(ref_path("range.bam"),
                                        blocks_per_batch=4))
    assert got == want


def test_hts_open_dispatch():
    from htslib_tpu.sam.bam import BamReader
    from htslib_tpu.vcf.io import VcfReader
    from htslib_tpu.cram import CramReader
    r = hts_open(ref_path("range.bam"))
    assert isinstance(r, BamReader)
    assert sum(1 for _ in r) > 0
    r.close()
    r = hts_open(ref_path("index.vcf"))
    assert isinstance(r, VcfReader)
    assert sum(1 for _ in r) > 0
    r.close()
    r = hts_open(ref_path("range.cram"), ref=ref_path("ce.fa"))
    assert isinstance(r, CramReader)
    assert r.read1() is not None
    r.close()


def test_process_queue_stats():
    """Wall/wait accounting (the working form of hts_tpool's
    total_time/wait_time fields, thread_pool_internal.h:162)."""
    import time

    from htslib_tpu.pipeline import ProcessQueue

    q = ProcessQueue(in_limit=2, out_limit=2)
    for i in range(6):
        q.dispatch(lambda x: (time.sleep(0.01), x)[1], i)
    got = [q.next_result() for _ in range(6)]
    assert got == list(range(6))
    s = q.stats()
    assert s["n_jobs"] == 6
    assert s["busy_time"] >= 0.05
    assert s["total_time"] >= s["busy_time"] / 8
    assert s["consumer_wait"] >= 0.0 and s["producer_wait"] >= 0.0
