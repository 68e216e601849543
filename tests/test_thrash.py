"""Concurrency stress (the test/thrash_threads*.c strategy): hammer the
native batch paths from many Python threads at once — shared BGZF
readers/writers, the fused formatter, and the SAM parser — and require
bit-exact results with no deadlocks or native faults."""
import os
import threading

import numpy as np
import pytest

from htslib_tpu.bgzf import BGZFReader, BGZFWriter
from htslib_tpu.sam import BamReader
from htslib_tpu.sam.batch import bam_stream_to_sam, sam_text_to_bam
from tests.conftest import has_ref, ref_path


@pytest.mark.slow
def test_parallel_bam_conversions_bit_exact(tmp_path):
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        data = np.asarray(r.fp.read_all())
    want_sam = bam_stream_to_sam(data, hdr).tobytes()
    want_bam = sam_text_to_bam(want_sam, hdr).tobytes()

    errors = []

    def worker(i):
        try:
            for _ in range(8):
                s = bam_stream_to_sam(data, hdr).tobytes()
                if s != want_sam:
                    raise AssertionError("SAM output differs")
                b = sam_text_to_bam(s, hdr).tobytes()
                if b != want_bam:
                    raise AssertionError("BAM output differs")
        except Exception as e:  # pragma: no cover
            errors.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "worker deadlocked"
    assert not errors, errors


@pytest.mark.slow
def test_parallel_bgzf_write_read(tmp_path):
    payload = os.urandom(1 << 18) + b"x" * (1 << 18)
    errors = []

    def worker(i):
        try:
            p = str(tmp_path / f"t{i}.gz")
            for _ in range(4):
                w = BGZFWriter(p)
                w.write(payload)
                w.close()
                with BGZFReader(p) as r:
                    if bytes(r.read_all()) != payload:
                        raise AssertionError("BGZF roundtrip differs")
                    if not r.check_eof():
                        raise AssertionError("missing EOF block")
        except Exception as e:  # pragma: no cover
            errors.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "worker deadlocked"
    assert not errors, errors


# ---------------------------------------------------------------------------
# the remaining thrash_threads{1..7}.c scenarios (VERDICT r2 #9)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_thrash_open_close_storm():
    """thrash_threads1-style: open/partial-read/close storms on a
    shared BGZF file from many threads."""
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    path = ref_path("range.bam")
    errors = []

    def worker(i):
        try:
            for k in range(30):
                r = BGZFReader(path)
                n = (i * 37 + k * 101) % 5000
                data = r.read(n)
                assert len(data) == n
                r.close()
        except Exception as e:
            errors.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "open/close storm deadlocked"
    assert not errors, errors


@pytest.mark.slow
def test_thrash_seek_storm():
    """thrash_threads2/5-style: random virtual-offset seeks + reads."""
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    path = ref_path("range.bam")
    with BGZFReader(path) as r0:
        head = bytes(r0.read(4096))
        voffs = []
        r0.seek(0)
        for _ in range(16):
            voffs.append(r0.tell())
            if not r0.read(512):
                break
    errors = []

    def worker(i):
        try:
            rng = np.random.RandomState(i)
            r = BGZFReader(path)
            for _ in range(60):
                v = voffs[rng.randint(0, len(voffs))]
                r.seek(v)
                r.read(int(rng.randint(1, 2048)))
            r.seek(0)
            assert bytes(r.read(4096)) == head
            r.close()
        except Exception as e:
            errors.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "seek storm deadlocked"
    assert not errors, errors


@pytest.mark.slow
def test_thrash_truncation_storm(tmp_path):
    """thrash_threads6-style EOF storms: truncated files must fail
    cleanly (no hangs, no native faults) under concurrency."""
    payload = os.urandom(1 << 17)
    good = str(tmp_path / "good.gz")
    w = BGZFWriter(good)
    w.write(payload)
    w.close()
    raw = open(good, "rb").read()
    cuts = [len(raw) - 5, len(raw) - 28, len(raw) // 2,
            len(raw) // 2 + 7]
    for i, c in enumerate(cuts):
        open(str(tmp_path / f"trunc{i}.gz"), "wb").write(raw[:c])
    errors = []

    def worker(i):
        try:
            for k in range(20):
                p = str(tmp_path / f"trunc{(i + k) % len(cuts)}.gz")
                try:
                    with BGZFReader(p) as r:
                        r.read_all()
                        # a cut before/inside the EOF marker must be
                        # detected: either an exception above or an
                        # unconfirmed EOF marker here
                        assert r.check_eof() != 1
                except (IOError, ValueError, EOFError):
                    pass                    # clean failure is the contract
        except Exception as e:
            errors.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "truncation storm deadlocked"
    assert not errors, errors


@pytest.mark.slow
def test_thrash_cram_mt_storm(tmp_path):
    """thrash_threads7-style on the CRAM MT path: concurrent encode
    (threaded container flush) + decode round trips."""
    from htslib_tpu.cram import CramWriter
    from htslib_tpu.cram.batch import cram_file_to_sam
    from htslib_tpu.sam import SamReader
    src = ref_path("ce#1000.sam")
    if not has_ref("ce#1000.sam"):
        pytest.skip("no corpus")
    with SamReader(src) as sr:
        recs = list(sr)
        hdr = sr.header
    want = b"".join(r.to_sam(hdr).encode() + b"\n" for r in recs)
    errors = []

    def worker(i):
        try:
            p = str(tmp_path / f"c{i}.cram")
            for _ in range(3):
                with CramWriter(p, hdr, nthreads=2,
                                seqs_per_slice=100) as cw:
                    for r in recs:
                        cw.write(r)
                h, sam = cram_file_to_sam(p)
                if bytes(sam.tobytes()) != want:
                    raise AssertionError("CRAM MT roundtrip differs")
        except Exception as e:
            errors.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
        assert not t.is_alive(), "CRAM MT storm deadlocked"
    assert not errors, errors


@pytest.mark.slow
def test_thrash_process_queues():
    """The hts_tpool_process contract under load: many queues share the
    pool, non-blocking dispatch backs off on full input sides, output
    limits throttle workers, and results drain strictly in dispatch
    order."""
    from htslib_tpu.pipeline import ProcessQueue, shared_pool
    pool = shared_pool()
    errors = []

    def worker(i):
        try:
            q = ProcessQueue(pool, in_limit=4, out_limit=3)
            rng = np.random.RandomState(i)
            n = 60
            submitted = 0
            drained = 0
            results = []
            while drained < n:
                if submitted < n and q.try_dispatch(
                        lambda v: v * v, submitted):
                    submitted += 1
                    continue
                r = q.next_result(wait=True)
                if r is not None:
                    results.append(r)
                    drained += 1
            assert results == [v * v for v in range(n)]
            # blocking dispatch leg: drain opportunistically while
            # dispatching (with out_limit < n a producer that never
            # drains would deadlock itself — same contract as
            # hts_tpool, whose samples drain from a second thread)
            got = []
            for v in range(40):
                q.dispatch(lambda x: x + 1, v)
                r = q.next_result(wait=False)
                if r is not None:
                    got.append(r)
            got += q.flush()
            assert got == list(range(1, 41))
            q.shutdown()
        except Exception as e:
            errors.append((i, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
        assert not t.is_alive(), "process-queue thrash deadlocked"
    assert not errors, errors
