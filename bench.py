#!/usr/bin/env python
"""Benchmark: BAM->SAM decode throughput (the BASELINE.json headline).

Pipeline measured end-to-end: BGZF batch inflate (native libdeflate) ->
record framing scan -> columnar decode -> fully vectorised SAM text
formatting, byte-exact vs the record-at-a-time reference path.

Prints ONE JSON line:
  {"metric": ..., "value": GB/s, "unit": "GB/s", "vs_baseline": ...}

vs_baseline is measured against the reference htslib built and timed on
THIS host (scripts/measure_baseline.py -> BASELINE_MEASURED.json,
16-thread `test_view` BAM->SAM over the same generated input); falls
back to the BASELINE.json north-star per-chip share (0.625 GB/s) when no
measured baseline exists.  Device-path numbers (and why the headline
stays on the host on this rig) live in docs/DEVICE_LIMITS.md and
scripts/bench_device.py.
"""
import json
import os
import struct
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from htslib_tpu.util.memory import tune_host_allocator

NORTH_STAR_PER_CHIP = 5.0 / 8  # GB/s


def baseline_gbps():
    """Measured htslib 16-thread BAM->SAM rate on this host, if the
    baseline harness has been run (BASELINE.md); else the north star."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as fh:
            m = json.load(fh)
        return float(m["workloads"]["bam2sam@16"]["gbps_uncompressed"]), \
            "htslib test_view -@16 (measured, BASELINE_MEASURED.json)"
    except (OSError, KeyError, ValueError):
        return NORTH_STAR_PER_CHIP, "north-star 5 GB/s / 8 chips"


def build_test_bam(path, n_records=400000, read_len=100, seed=42):
    from htslib_tpu.sam import BamWriter, SamHeader
    from htslib_tpu.sam.record import BamRecord
    rng = np.random.default_rng(seed)
    hdr = SamHeader("@HD\tVN:1.6\tSO:coordinate\n"
                    "@SQ\tSN:chr1\tLN:249250621\n"
                    "@RG\tID:rg1\tSM:sample1\n")
    w = BamWriter(path, hdr, level=6)
    # realistic template records, randomized fields, written in batches
    n_templates = 500
    bases = np.frombuffer(b"ACGT", np.uint8)
    payloads = []
    pos = 10000
    for i in range(n_templates):
        seq = bases[rng.integers(0, 4, read_len)].tobytes().decode()
        qual = "".join(chr(33 + int(q)) for q in rng.integers(20, 41, read_len))
        pos += int(rng.integers(1, 50))
        nm = int(rng.integers(0, 4))
        line = (f"read{i:09d}\t99\tchr1\t{pos}\t60\t{read_len}M\t=\t"
                f"{pos + 300}\t{300 + read_len}\t{seq}\t{qual}\t"
                f"NM:i:{nm}\tMD:Z:{read_len}\tAS:i:{read_len - nm}\t"
                f"XS:i:{int(rng.integers(0, 40))}\tRG:Z:rg1")
        rec = BamRecord.from_sam(line, hdr)
        buf = rec.to_bam_buffer()
        payloads.append(struct.pack("<I", len(buf)) + buf)
    blob = b"".join(payloads)
    reps = max(1, n_records // n_templates)
    for _ in range(reps):
        w.fp.write(blob)
    w.close()
    return n_templates * reps


def bench_host(bam_path, trials=6):
    from htslib_tpu.sam import BamReader
    from htslib_tpu.sam.batch import bam_file_to_sam
    # uncompressed payload size for the GB/s numerator (same input-bytes
    # convention as htslib test_view benchmarking)
    with BamReader(bam_path) as r:
        usize = len(r.fp.read_all())
    best = None
    out_len = 0
    for _ in range(trials):
        t0 = time.time()
        hdr, out = bam_file_to_sam(bam_path)
        dt = time.time() - t0
        out_len = len(out)
        best = dt if best is None else min(best, dt)
    return usize, out_len, best


def bench_cram(bam_path, n_records, trials=3):
    """CRAM encode (no_ref, as the measured htslib baseline config) and
    slice-parallel decode rates over the same records."""
    from htslib_tpu.cram import CramWriter
    from htslib_tpu.cram.batch import cram_file_to_sam
    from htslib_tpu.sam import BamReader
    with BamReader(bam_path) as r:
        hdr = r.header
        recs = list(r)
    cram = bam_path + ".cram"
    best_enc = None
    for _ in range(trials):
        t0 = time.time()
        with CramWriter(cram, hdr) as cw:
            for rec in recs:
                cw.write(rec)
        dt = time.time() - t0
        best_enc = dt if best_enc is None else min(best_enc, dt)
    best_dec = None
    for _ in range(trials):
        t0 = time.time()
        cram_file_to_sam(cram, window=4)
        dt = time.time() - t0
        best_dec = dt if best_dec is None else min(best_dec, dt)
    return {
        "encode_krec_s": round(n_records / best_enc / 1e3, 1),
        "decode_krec_s": round(n_records / best_dec / 1e3, 1),
        "cram_mb": round(os.path.getsize(cram) / 1e6, 1),
    }


def main():
    tune_host_allocator(1 << 30)
    tmpdir = tempfile.mkdtemp(prefix="htstpu_bench_")
    bam = os.path.join(tmpdir, "bench.bam")
    n = build_test_bam(bam)
    usize, out_len, dt = bench_host(bam)
    gbps = usize / dt / 1e9
    base, base_src = baseline_gbps()
    result = {
        "metric": "BAM->SAM decode throughput (1 host, batch pipeline)",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base, 4),
        "detail": {
            "records": n,
            "uncompressed_mb": round(usize / 1e6, 1),
            "sam_out_mb": round(out_len / 1e6, 1),
            "seconds": round(dt, 3),
            "baseline": base_src,
            "baseline_gbps": round(base, 4),
            "vs_north_star_per_chip": round(gbps / NORTH_STAR_PER_CHIP, 4),
            "cram": bench_cram(bam, n),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
