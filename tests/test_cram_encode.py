"""CRAM encode round-trip tests: decode(encode(x)) == x over the corpus
(test/cross_validate.sh contract).

Normalisations applied on both sides, matching reference behavior:
  * unmapped reads lose MAPQ/CIGAR (compare_sam.pl:107)
  * =/X CIGAR ops degrade to M in no-ref encoding (as in the reference's
    no_ref mode) and zero-length ops are unrepresentable in the CRAM
    feature stream
"""
import glob
import os
import re

import pytest

from htslib_tpu.cram import CramReader, CramWriter
from htslib_tpu.sam import BamReader, SamReader
from tests.conftest import REF_TEST, ref_path, has_ref

CORPUS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(REF_TEST, "*.sam"))
) if os.path.isdir(REF_TEST) else []


def norm(line):
    f = line.split("\t")
    if int(f[1]) & 4:
        f[4] = "0"
        f[5] = "*"
    f[5] = re.sub(r"(\d+)[=X]", r"\1M", f[5])
    f[5] = re.sub(r"0[MIDNSHP]", "", f[5]) or "*"
    while True:
        m = re.match(r"(.*?)(\d+)M(\d+)M(.*)", f[5])
        if not m:
            break
        f[5] = m.group(1) + str(int(m.group(2)) + int(m.group(3))) + "M" + m.group(4)
    return "\t".join(f)


@pytest.mark.parametrize("fname", CORPUS or ["skip"])
def test_cram_encode_roundtrip(fname, tmp_path):
    if fname == "skip":
        pytest.skip("no corpus")
    with SamReader(ref_path(fname)) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "t.cram")
    with CramWriter(cram, hdr) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(cram) as r2:
        got = [norm(rec.to_sam(hdr)) for rec in r2]
    want = [norm(rec.to_sam(hdr)) for rec in recs]
    assert got == want, f"CRAM round-trip mismatch for {fname}"


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_cram_encode_range_bam(tmp_path):
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "range.cram")
    with CramWriter(cram, hdr) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(cram) as r2:
        got = [norm(rec.to_sam(hdr)) for rec in r2]
    want = [norm(rec.to_sam(hdr)) for rec in recs]
    assert got == want


def test_multi_slice_container(tmp_path):
    # force multiple containers via small slices
    from htslib_tpu.cram.encode import CramEncoder
    with SamReader(ref_path("ce#1000.sam")) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "multi.cram")
    enc = CramEncoder(cram, hdr, seqs_per_slice=100)
    for rec in recs:
        enc.write(rec)
    enc.close()
    with CramReader(cram) as r2:
        got = [rec.to_sam(hdr) for rec in r2]
    assert got == [rec.to_sam(hdr) for rec in recs]
