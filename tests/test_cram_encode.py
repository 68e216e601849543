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
    # =/X degrade to M; zero-length ops are unrepresentable; adjacent
    # same-op runs merge in the CRAM feature stream (all as in the
    # reference decoder)
    f[5] = re.sub(r"(\d+)[=X]", r"\1M", f[5])
    f[5] = re.sub(r"(?<![0-9])0[MIDNSHP]", "", f[5]) or "*"
    if f[5] != "*":
        ops = re.findall(r"(\d+)([MIDNSHP])", f[5])
        merged = []
        for n, op in ops:
            if merged and merged[-1][1] == op:
                merged[-1][0] += int(n)
            else:
                merged.append([int(n), op])
        f[5] = "".join(f"{n}{op}" for n, op in merged) or "*"
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


REF_CASES = [f for f in CORPUS
             if os.path.exists(os.path.join(
                 REF_TEST, f.split("#")[0] + ".fa"))]


@pytest.mark.parametrize("fname", REF_CASES or ["skip"])
def test_cram_encode_roundtrip_with_reference(fname, tmp_path):
    # reference-based mode: implicit matches + substitution features
    if fname == "skip":
        pytest.skip("no corpus")
    fa = ref_path(fname.split("#")[0] + ".fa")
    with SamReader(ref_path(fname)) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "t.cram")
    with CramWriter(cram, hdr, ref=fa) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(cram, ref=fa, decode_md=False) as r2:
        got = [norm(rec.to_sam(hdr)) for rec in r2]
    want = [norm(rec.to_sam(hdr)) for rec in recs]
    assert got == want, f"ref-based CRAM round-trip mismatch for {fname}"


def test_ref_based_is_smaller_and_generates_md(tmp_path):
    # encoding with a reference should beat no-ref size on real data and
    # the decoder regenerates MD/NM from the reference
    from htslib_tpu.sam import BamReader
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        recs = list(r)
    noref = str(tmp_path / "noref.cram")
    withref = str(tmp_path / "ref.cram")
    with CramWriter(noref, hdr) as w:
        for rec in recs:
            w.write(rec)
    with CramWriter(withref, hdr, ref=ref_path("ce.fa")) as w:
        for rec in recs:
            w.write(rec)
    assert os.path.getsize(withref) < os.path.getsize(noref)
    with CramReader(withref, ref=ref_path("ce.fa")) as r2:
        rec = r2.read1()
        assert rec.get_aux("MD") is not None
        assert rec.get_aux("NM") is not None


def test_embed_ref_decodes_without_fasta(tmp_path):
    # CRAM_OPT_EMBED_REF: the reference window travels inside each slice
    # (ref_base_id block), so decode needs no external reference at all
    from htslib_tpu.sam import BamReader
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        recs = list(r)
    p = str(tmp_path / "e.cram")
    with CramWriter(p, hdr, ref=ref_path("ce.fa"), embed_ref=1) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(p) as r2:  # no ref argument
        back = [rec.to_sam(hdr) for rec in r2]
    assert back == [rec.to_sam(hdr) for rec in recs]
