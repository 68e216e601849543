"""Robustness fuzzing of the open/read paths (the hts_open_fuzzer.c
strategy, test/fuzz/hts_open_fuzzer.c): deterministic truncations and
byte flips of valid seed files must produce clean Python exceptions —
never crashes, hangs, or native faults.

Runs inside one subprocess so a segfault in the C++ layer fails the
test instead of killing the pytest process.
"""
import os
import subprocess
import sys

import pytest

from tests.conftest import REF_TEST

_FUZZ_CODE = r"""
import io, os, sys, traceback
sys.path.insert(0, %(repo)r)
REF = %(ref)r

SEEDS = [
    ("bam", os.path.join(REF, "range.bam")),
    ("sam", os.path.join(REF, "ce#1000.sam")),
    ("cram", os.path.join(REF, "range.cram")),
    ("vcf", os.path.join(REF, "index.vcf")),
    ("bgzf", os.path.join(REF, "bgziptest.txt.gz")),
    ("fai", os.path.join(REF, "ce.fa.fai")),
]

def consume(kind, path):
    # mirror hts_open_fuzzer: open, read everything, ignore data
    from htslib_tpu.format import detect_format
    from htslib_tpu.hfile import hopen
    with hopen(path, "rb") as f:
        detect_format(f)
    if kind == "bam":
        from htslib_tpu.sam import BamReader
        from htslib_tpu.sam.batch import bam_stream_to_sam
        with BamReader(path) as r:
            data = r.fp.read_all()
            bam_stream_to_sam(data, r.header)
    elif kind == "sam":
        from htslib_tpu.sam import SamReader
        from htslib_tpu.sam.batch import sam_text_to_bam
        with SamReader(path) as r:
            hdr = r.header
            for rec in r:
                pass
        sam_text_to_bam(open(path, "rb").read(), hdr)
    elif kind == "cram":
        from htslib_tpu.cram import CramReader
        with CramReader(path, ref=os.path.join(REF, "ce.fa")) as r:
            for rec in r:
                pass
    elif kind == "vcf":
        from htslib_tpu.vcf import open_vcf
        with open_vcf(path) as r:
            for rec in r:
                rec.to_vcf(r.header)
    elif kind == "bgzf":
        from htslib_tpu.bgzf import BGZFReader
        with BGZFReader(path) as r:
            r.read_all()
            r.check_eof()
    elif kind == "fai":
        from htslib_tpu.faidx import Faidx
        Faidx.load(os.path.join(REF, "ce.fa"), path)

ncases = 0
for kind, seed in SEEDS:
    if not os.path.exists(seed):
        continue
    orig = open(seed, "rb").read()
    cases = []
    n = len(orig)
    # truncations at 17 deterministic points
    for i in range(1, 18):
        cases.append(orig[: n * i // 18])
    # byte flips at deterministic positions, 3 flip values
    step = max(1, n // 23)
    for off in range(0, n, step):
        for v in (0x00, 0xFF, 0x5A):
            m = bytearray(orig)
            m[off] ^= v if v else 0x80
            cases.append(bytes(m))
    # garbage prefixes
    cases.append(b"\x1f\x8b" + orig[:64])
    cases.append(b"CRAM" + b"\xff" * 64)
    cases.append(b"")
    for ci, data in enumerate(cases):
        tmp = "/tmp/fuzz_%%s_%%d" %% (kind, os.getpid())
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            consume(kind, tmp)
        except KeyboardInterrupt:
            raise
        except Exception:
            pass  # clean exception: expected for corrupt input
        ncases += 1
print("FUZZ_OK", ncases)
"""


@pytest.mark.slow
def test_fuzz_corrupt_inputs_no_crash():
    code = _FUZZ_CODE % {"repo": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ref": REF_TEST}
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600, env=env)
    assert r.returncode == 0, (
        f"fuzz subprocess died (rc={r.returncode}):\n"
        f"stdout: {r.stdout[-2000:]}\nstderr: {r.stderr[-2000:]}")
    assert "FUZZ_OK" in r.stdout, r.stdout[-500:]


def test_rans4x16_x32_corrupt_input_fuzz():
    """The AVX2 32-state decode tier must reject or tolerate corrupt
    streams without faulting (truncations, byte flips, garbage with a
    valid flag byte)."""
    import random

    from htslib_tpu.codecs import rans4x16
    from htslib_tpu.native import native
    if native is None:
        pytest.skip("native library unavailable")
    random.seed(42)
    base = bytes(random.randrange(0, 45) for _ in range(20000))
    for fl in (0x04, 0x05):
        comp = bytearray(rans4x16.compress(base, fl))
        for trial in range(150):
            c = bytearray(comp)
            op = trial % 3
            if op == 0 and len(c) > 10:
                c = c[:random.randrange(1, len(c))]
            elif op == 1:
                for _ in range(random.randrange(1, 8)):
                    c[random.randrange(len(c))] = random.randrange(256)
            else:
                c = bytearray(random.randbytes(random.randrange(1, 4000)))
                c[0:1] = bytes([fl])
            try:
                native.rans4x16_uncompress(bytes(c))
            except ValueError:
                pass
