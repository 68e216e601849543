"""Batch CRAM decode pipeline (cram/batch.py): the slice-parallel
decode-ahead path (cram_decode_slice_mt + cram_next_slice,
cram_decode.c:3047,3268) must be byte-identical to the record-at-a-time
reader on every input it accepts."""
import os
import struct

import pytest

from conftest import REF_TEST

from htslib_tpu.cram import CramReader, CramWriter
from htslib_tpu.cram.batch import (cram_file_to_bam_stream,
                                   cram_file_to_sam, iter_slice_blobs)
from htslib_tpu.sam import SamReader


def record_path_sam(path, ref=None, decode_md=True):
    out = []
    with CramReader(path, ref=ref, decode_md=decode_md) as cr:
        hdr = cr.header
        for rec in cr:
            out.append(rec.to_sam(hdr).rstrip("\n"))
    return ("\n".join(out) + "\n" if out else "").encode()


@pytest.mark.parametrize("name,ref", [
    ("range.cram", "ce.fa"),
    ("ce#5b_java.cram", "ce.fa"),
    ("xx#large_aux_java.cram", "xx.fa"),
])
def test_batch_matches_record_path_corpus(name, ref):
    path = os.path.join(REF_TEST, name)
    refp = os.path.join(REF_TEST, ref)
    hdr, sam = cram_file_to_sam(path, ref=refp)
    assert bytes(sam.tobytes()) == record_path_sam(path, ref=refp)


@pytest.mark.parametrize("version", [(3, 0), (3, 1)])
def test_batch_roundtrip_written_cram(tmp_path, version):
    src = os.path.join(REF_TEST, "ce#1000.sam")
    refp = os.path.join(REF_TEST, "ce.fa")
    with SamReader(src) as sr:
        recs = list(sr)
        hdr = sr.header
    out = str(tmp_path / "t.cram")
    with CramWriter(out, hdr, ref=refp, version=version) as cw:
        for r in recs:
            cw.write(r)
    h, sam = cram_file_to_sam(out, ref=refp)
    assert bytes(sam.tobytes()) == record_path_sam(out, ref=refp)
    want = ("\n".join(r.to_sam(hdr).rstrip("\n") for r in recs)
            + "\n").encode()
    assert bytes(sam.tobytes()) == want


def test_batch_no_ref(tmp_path):
    src = os.path.join(REF_TEST, "ce#1000.sam")
    with SamReader(src) as sr:
        recs = list(sr)
        hdr = sr.header
    out = str(tmp_path / "nr.cram")
    with CramWriter(out, hdr) as cw:   # no_ref
        for r in recs:
            cw.write(r)
    h, sam = cram_file_to_sam(out)
    assert bytes(sam.tobytes()) == record_path_sam(out)


def test_bam_stream_framing(tmp_path):
    src = os.path.join(REF_TEST, "ce#1000.sam")
    with SamReader(src) as sr:
        recs = list(sr)
        hdr = sr.header
    out = str(tmp_path / "s.cram")
    with CramWriter(out, hdr) as cw:
        for r in recs:
            cw.write(r)
    h, blob = cram_file_to_bam_stream(out)
    n = 0
    p = 0
    while p < len(blob):
        (bsz,) = struct.unpack_from("<I", blob, p)
        p += 4 + bsz
        n += 1
    assert p == len(blob)
    assert n == len(recs)


def test_direct_formatter_edge_records(tmp_path):
    """The fused native slice->SAM path formats straight from decoded
    record arenas (no BAM blob); hostile record shapes must match the
    record-at-a-time path byte for byte: ambiguity/lowercase bases (BAM
    nibble canonicalisation), '*' quals, unmapped mates, empty aux, and
    a soft-clip-everything CIGAR (the CG-escape-shaped detour)."""
    sam_text = "\n".join([
        "@HD\tVN:1.6\tSO:coordinate",
        "@SQ\tSN:c1\tLN:10000",
        "@RG\tID:rgx\tSM:s",
        # lowercase + ambiguity codes; canonicalised by nibble tables
        "r1\t0\tc1\t100\t30\t8M\t*\t0\t0\tacgtMRWS\tIIIIIIII\tRG:Z:rgx",
        "r2\t0\tc1\t120\t30\t4M\t*\t0\t0\tNNKD\t*",                  # no qual
        # soft-clip-everything CIGAR: same shape the CG escape uses
        "r3\t0\tc1\t140\t0\t6S\t*\t0\t0\tACGTAC\t!!!!!!",
        "r4\t4\t*\t0\t0\t*\t*\t0\t0\tGGGG\tJJJJ",                    # unmapped
        "r5\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*",                          # no seq
        # true CG escape: 2-op placeholder <qlen>S<span>N + CG:B,I real
        # cigar (3M50N3M) — bam_tag2cigar (sam.c:680) swaps it in; both
        # paths must emit the real cigar with the CG tag dropped
        "r6\t0\tc1\t200\t0\t6S56N\t*\t0\t0\tACGTAC\tIIIIII\t"
        "CG:B:I,48,803,48",
    ]) + "\n"
    src = tmp_path / "edge.sam"
    src.write_text(sam_text)
    with SamReader(str(src)) as sr:
        recs = list(sr)
        hdr = sr.header
    out = str(tmp_path / "edge.cram")
    with CramWriter(out, hdr) as cw:
        for r in recs:
            cw.write(r)
    h, sam = cram_file_to_sam(out)
    assert bytes(sam.tobytes()) == record_path_sam(out)
