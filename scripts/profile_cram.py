#!/usr/bin/env python
"""Profile the CRAM decode hot path: where does cram_file_to_sam spend
its time on the bench input?  Breaks the pipeline into
  (a) serial container/block walk          (_slice_jobs)
  (b) native fused decode+format, 1 thread (cram_slice_to_sam per slice)
  (c) the full decode-ahead pipeline       (cram_file_to_sam)
so the parallel efficiency and the single-thread ceiling are visible.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORK = "/tmp/htstpu_prof"


def ensure_input():
    os.makedirs(WORK, exist_ok=True)
    bam = os.path.join(WORK, "bench.bam")
    cram = os.path.join(WORK, "bench.cram")
    if not os.path.exists(cram):
        import bench
        n = bench.build_test_bam(bam)
        from htslib_tpu.cram import CramWriter
        from htslib_tpu.sam import BamReader
        with BamReader(bam) as r:
            hdr = r.header
            recs = list(r)
        with CramWriter(cram, hdr) as cw:
            for rec in recs:
                cw.write(rec)
        print(f"built {cram}: {os.path.getsize(cram)/1e6:.1f} MB, {n} recs")
    return cram


def main():
    from htslib_tpu.util.memory import tune_host_allocator
    tune_host_allocator(1 << 30)
    cram = ensure_input()
    from htslib_tpu.cram import CramReader
    from htslib_tpu.cram.batch import (_slice_jobs, _slice_to_sam_stage,
                                       cram_file_to_sam)
    import threading

    # (a) serial walk
    t0 = time.time()
    with CramReader(cram) as r:
        jobs = list(_slice_jobs(r))
        n_slices = len(jobs)
    t_walk = time.time() - t0
    print(f"(a) serial walk: {t_walk:.3f}s for {n_slices} slices")

    # (b) single-threaded stage work
    with CramReader(cram) as r:
        jobs = list(_slice_jobs(r))
        stage = _slice_to_sam_stage(r, threading.Lock(), True)
        t0 = time.time()
        outs = [stage(j) for j in jobs]
        t_stage = time.time() - t0
    nbytes = sum(len(o) for o in outs)
    nrec = sum(bytes(o).count(b"\n") for o in outs)
    print(f"(b) stage x1 thread: {t_stage:.3f}s  ({nbytes/1e6:.1f} MB SAM, "
          f"{nrec} records)")

    # (c) full pipeline
    for w in (2, 4, 8):
        t0 = time.time()
        hdr, out = cram_file_to_sam(cram, window=w)
        dt = time.time() - t0
        print(f"(c) pipeline window={w}: {dt:.3f}s  -> "
              f"{nrec/dt/1e3:.0f} krec/s")


if __name__ == "__main__":
    main()
