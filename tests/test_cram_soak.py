"""Randomised CRAM round-trip soak.

Generates random BAMs (random CIGARs over M/I/S/D/N, aux zoo, both
contigs, unmapped reads) and asserts a byte-exact SAM round trip
through our CRAM writer/reader across versions 3.0/3.1, varied slice
geometry and thread counts.  When the reference htslib build is
present (/tmp/htslib-build, scripts/build_reference_htslib.sh), also
asserts the reference `test_view` can read every CRAM we wrote.

Records are generated in CRAM-canonical form, because the format (and
reference htslib, cram_encode.c) canonicalises on encode:

* adjacent same-op CIGAR runs merge (``5M5M`` -> ``10M``), and ``=``/``X``
  become ``M`` — verified against reference test_view -C;
* unmapped records store no MAPQ (decodes as 0).
"""
import os
import random
import subprocess

import numpy as np
import pytest

from htslib_tpu.sam import SamHeader, BamWriter
from htslib_tpu.sam.batch import bam_file_to_sam
from htslib_tpu.sam.record import BamRecord
from htslib_tpu.cram.batch import bam_to_cram_file, cram_file_to_sam

BUILD = os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build")
TV = os.path.join(BUILD, "test", "test_view")

HDR_TEXT = ("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:c1\tLN:100000\n"
            "@SQ\tSN:c2\tLN:50000\n@RG\tID:rg\tSM:s\n")


def _rand_cigar(rng, rnd, L):
    ops, left, last = [], L, None
    while left > 0:
        k = int(rng.integers(1, left + 1))
        op = rnd.choice([o for o in "MIS" if o != last])
        ops.append(f"{k}{op}")
        last = op
        left -= k
        if rnd.random() < 0.3 and left > 0:
            d = rnd.choice("DN")
            ops.append(f"{int(rng.integers(1, 9))}{d}")
            last = d
    return "".join(ops) or f"{L}M"


def _rand_rec(rng, rnd, hdr, i, tid, pos):
    L = int(rng.integers(1, 160))
    cig = _rand_cigar(rng, rnd, L)
    seq = "".join(rnd.choice("ACGTN") for _ in range(L))
    qual = "".join(chr(33 + int(x)) for x in rng.integers(0, 60, L))
    flag = rnd.choice([0, 16, 99, 147, 4])
    mapq = 0 if flag & 4 else int(rng.integers(0, 61))
    aux = []
    if rnd.random() < 0.6:
        aux.append(f"NM:i:{int(rng.integers(0, 10))}")
    if rnd.random() < 0.4:
        aux.append(f"XZ:Z:str{i}")
    if rnd.random() < 0.3:
        aux.append("XF:f:1.25")
    if rnd.random() < 0.3:
        vals = ",".join(str(int(x)) for x in rng.integers(-100, 100, 5))
        aux.append(f"XB:B:s,{vals}")
    line = (f"r{i}\t{flag}\t{'c1' if tid == 0 else 'c2'}\t{pos}\t{mapq}\t"
            f"{'*' if flag & 4 else cig}\t*\t0\t0\t{seq}\t{qual}"
            + ("\t" + "\t".join(aux) if aux else ""))
    return BamRecord.from_sam(line, hdr)


@pytest.mark.parametrize("trial", range(4))
def test_cram_soak_roundtrip(tmp_path, trial):
    rng = np.random.default_rng(1000 + trial)
    rnd = random.Random(1000 + trial)
    hdr = SamHeader(HDR_TEXT)
    n = int(rng.integers(200, 900))
    recs = []
    for tid in (0, 1):
        pos = 1
        for _ in range(n // 2):
            pos += int(rng.integers(0, 30))
            recs.append(_rand_rec(rng, rnd, hdr, len(recs), tid, pos))
    bam = str(tmp_path / "soak.bam")
    with BamWriter(bam, hdr) as w:
        for r in recs:
            w.write(r)
    ver = rnd.choice([(3, 0), (3, 1)])
    cram = str(tmp_path / "soak.cram")
    bam_to_cram_file(bam, cram, nthreads=rnd.choice([1, 2, 4]), version=ver,
                     seqs_per_slice=rnd.choice([100, 333, 10000]),
                     slices_per_container=rnd.choice([1, 3]))
    _, want = bam_file_to_sam(bam)
    _, got = cram_file_to_sam(cram)
    assert bytes(got.tobytes()) == bytes(want.tobytes()), (trial, ver)
    if os.path.exists(TV):
        ref = subprocess.run([TV, cram], capture_output=True, timeout=120)
        assert ref.returncode == 0, ref.stderr[:300]
