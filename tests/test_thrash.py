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
