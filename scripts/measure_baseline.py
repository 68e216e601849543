#!/usr/bin/env python
"""Measure the reference htslib's performance on this host (VERDICT r1 #3).

Requires an htslib build at HTSLIB_BUILD (default /tmp/htslib-build) made
from a copy of /root/reference with the htscodecs-API shim in
htslib_tpu/native/htscodecs_shim/ (the reference snapshot ships an empty
htscodecs submodule; the shim supplies wire-compatible codecs so the
reference's own C paths — bgzf.c, sam.c, cram/ — can run unmodified).

Workloads (test_view = reference test/test_view.c, the harness test.pl
uses for all conversions):
  bam2sam @1/@16   : test_view bench.bam > /dev/null
  sam2bam @1/@16   : test_view -S -b bench.sam
  cram_decode @1/@16 : test_view bench.cram (v3.0, gzip+rANS4x8)
  cram_encode @1/@16 : test_view -b->cram
GB/s numerator = uncompressed BAM payload bytes (BGZF payload), the same
convention bench.py uses.

Writes BASELINE_MEASURED.json at the repo root.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUILD = os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build")
TV = os.path.join(BUILD, "test", "test_view")
WORK = os.environ.get("HTSBENCH_DIR", "/tmp/htsbench")


def run_timed(cmd, trials=3, **kw):
    best = None
    for _ in range(trials):
        t0 = time.time()
        subprocess.run(cmd, check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL, **kw)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    if not os.path.exists(TV):
        print(json.dumps({"error": f"{TV} not built"}))
        return 1
    os.makedirs(WORK, exist_ok=True)
    bam = os.path.join(WORK, "bench.bam")
    if not os.path.exists(bam):
        from bench import build_test_bam
        build_test_bam(bam)
    from htslib_tpu.sam import BamReader
    with BamReader(bam) as r:
        usize = len(r.fp.read_all())

    sam = os.path.join(WORK, "bench.sam")
    if not os.path.exists(sam):
        with open(sam, "wb") as f:
            subprocess.run([TV, bam], check=True, stdout=f)
    cram = os.path.join(WORK, "bench.cram")
    if not os.path.exists(cram):
        with open(cram, "wb") as f:
            subprocess.run([TV, "-C", "-o", "no_ref=1", bam],
                           check=True, stdout=f)

    res = {"input_uncompressed_bytes": usize,
           "bam_bytes": os.path.getsize(bam),
           "sam_bytes": os.path.getsize(sam),
           "cram_bytes": os.path.getsize(cram),
           "host": os.uname().nodename,
           "cpus": os.cpu_count(),
           "workloads": {}}

    def record(name, cmd, trials=3):
        dt = run_timed(cmd, trials)
        res["workloads"][name] = {
            "seconds": round(dt, 4),
            "gbps_uncompressed": round(usize / dt / 1e9, 4),
        }
        print(f"{name}: {dt:.3f}s = {usize/dt/1e9:.3f} GB/s", file=sys.stderr)

    record("bam2sam@1", [TV, bam])
    record("bam2sam@16", [TV, "-@", "16", bam])
    record("sam2bam@1", [TV, "-S", "-b", sam])
    record("sam2bam@16", [TV, "-S", "-b", "-@", "16", sam])
    record("cram_decode@1", [TV, cram])
    record("cram_decode@16", [TV, "-@", "16", cram])
    record("cram_encode@1", [TV, "-C", "-o", "no_ref=1", bam])
    record("cram_encode@16", [TV, "-C", "-o", "no_ref=1", "-@", "16", bam])

    # mpileup + VCF lanes (VERDICT r2 #6); rates in output MB/s since
    # the numerator differs per lane
    def record_out_rate(name, cmd, trials=3):
        # capture size once, then time with stdout discarded
        out = subprocess.run(cmd, check=True, capture_output=True).stdout
        dt = run_timed(cmd, trials)
        res["workloads"][name] = {
            "seconds": round(dt, 4),
            "out_mbps": round(len(out) / dt / 1e6, 1),
        }
        print(f"{name}: {dt:.3f}s = {len(out)/dt/1e6:.1f} MB/s out",
              file=sys.stderr)

    plp = os.path.join(BUILD, "test", "pileup")
    deep = os.path.join(WORK, "deep.sam")
    if os.path.exists(plp):
        if not os.path.exists(deep):
            from bench import build_deep_sam
            build_deep_sam(deep)
        record_out_rate("mpileup@1", [plp, "-m", deep])

    htsfile = os.path.join(BUILD, "htsfile")
    bcf = os.path.join(WORK, "bench.bcf")
    if os.path.exists(htsfile):
        if not os.path.exists(bcf):
            from bench import build_test_bcf
            build_test_bcf(bcf)
        record_out_rate("bcf2vcf@1", [htsfile, "-c", bcf])

    out = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
        f.write("\n")
    print(json.dumps(res["workloads"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
