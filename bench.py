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
    """Generate a BAM of n_records UNIQUE paired records — random
    sequences, qualities, positions and aux values per record (no
    repeated templates; addresses the round-1 representativeness
    critique).  Fully vectorised record synthesis: all records share a
    fixed layout so the batch is one [N, W] byte matrix."""
    from htslib_tpu.sam import BamWriter, SamHeader
    rng = np.random.default_rng(seed)
    hdr = SamHeader("@HD\tVN:1.6\tSO:coordinate\n"
                    "@SQ\tSN:chr1\tLN:249250621\n"
                    "@RG\tID:rg1\tSM:sample1\n")
    n = n_records
    L = read_len
    qname_w = 14                        # "read%09d" + NUL
    half = (L + 1) // 2
    md_txt = str(L).encode()
    aux = (b"NMC\x00" + b"MDZ" + md_txt + b"\x00"
           + b"ASC\x00" + b"XSC\x00" + b"RGZrg1\x00")
    aux_w = len(aux)
    md_len = 3 + len(md_txt) + 1
    rec_w = 32 + qname_w + 4 + half + L + aux_w
    W = 4 + rec_w

    M = np.zeros((n, W), np.uint8)
    def put_u32(col, vals):
        v = vals.astype(np.uint32)
        for b in range(4):
            M[:, col + b] = (v >> (8 * b)) & 0xFF

    put_u32(0, np.full(n, rec_w, np.uint32))
    put_u32(4, np.zeros(n, np.uint32))                    # tid
    gaps = rng.integers(0, 3, n)
    pos = 9999 + np.cumsum(gaps)
    put_u32(8, pos)                                       # pos (0-based)
    M[:, 12] = qname_w                                    # l_qname
    M[:, 13] = 60                                         # mapq
    put_u32(14, np.zeros(n, np.uint32))                   # bin<<16|? (bin)
    M[:, 16] = 1                                          # n_cigar lo
    flags = np.where(np.arange(n) % 2 == 0, 99, 147)
    M[:, 18] = flags & 0xFF
    M[:, 19] = flags >> 8
    put_u32(20, np.full(n, L, np.uint32))                 # l_qseq
    put_u32(24, np.zeros(n, np.uint32))                   # mtid
    mpos = pos + np.where(flags == 99, 300, -300)
    put_u32(28, mpos.astype(np.int64).astype(np.uint32))
    tlen = np.where(flags == 99, 300 + L, -(300 + L))
    put_u32(32, tlen.astype(np.int64).astype(np.uint32))
    # qname "read%09d\0"
    q0 = 4 + 32
    M[:, q0:q0 + 4] = np.frombuffer(b"read", np.uint8)
    digits = np.arange(n)
    for d in range(9):
        M[:, q0 + 4 + (8 - d)] = 48 + (digits // 10 ** d) % 10
    M[:, q0 + 13] = 0
    # cigar: 100M
    c0 = q0 + qname_w
    put_u32(c0, np.full(n, (L << 4) | 0, np.uint32))
    # seq: random A/C/G/T nibbles packed
    s0 = c0 + 4
    nib = np.frombuffer(b"\x01\x02\x04\x08", np.uint8)[
        rng.integers(0, 4, (n, L))]
    M[:, s0:s0 + half] = (nib[:, 0::2] << 4) | nib[:, 1::2]
    # qual: random 20..40
    u0 = s0 + half
    M[:, u0:u0 + L] = rng.integers(20, 41, (n, L), dtype=np.uint8)
    # aux: fixed structure, varying small ints
    a0 = u0 + L
    M[:, a0:a0 + aux_w] = np.frombuffer(aux, np.uint8)
    M[:, a0 + 3] = rng.integers(0, 4, n, dtype=np.uint8)          # NM:C
    as_val = a0 + 4 + md_len + 3
    M[:, as_val] = (L - M[:, a0 + 3]).astype(np.uint8)            # AS:C
    M[:, as_val + 1 + 3] = rng.integers(0, 40, n, dtype=np.uint8)  # XS:C
    blob = M.tobytes()
    w = BamWriter(path, hdr, level=6)
    w.fp.write(blob)
    w.close()
    return n


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


def bench_sam2bam(bam_path, usize, trials=3):
    """Reverse direction: SAM text -> compressed BAM via the fused
    parse+deflate pipeline (sam.c:3325 + bgzf.c:1852 analogue)."""
    from htslib_tpu.sam.batch import bam_file_to_sam, sam_to_bam_file
    hdr, sam = bam_file_to_sam(bam_path)
    text = sam.tobytes()
    out = bam_path + ".rt.bam"
    best = None
    for _ in range(trials):
        t0 = time.time()
        sam_to_bam_file(text, hdr, out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(usize / best / 1e9, 4)


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
            "sam2bam_gbps": bench_sam2bam(bam, usize),
            "cram": bench_cram(bam, n),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
