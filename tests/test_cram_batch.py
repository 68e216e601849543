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


def test_bam_to_cram_file_fast_path(tmp_path):
    """The zero-parse RawRun encode path must produce CRAM that decodes
    back to the same records as the per-record CramWriter path."""
    from htslib_tpu.cram.batch import bam_to_cram_file
    from htslib_tpu.sam import BamWriter
    src = os.path.join(REF_TEST, "ce#1000.sam")
    with SamReader(src) as sr:
        recs = list(sr)
        hdr = sr.header
    bam = str(tmp_path / "x.bam")
    with BamWriter(bam, hdr) as bw:
        for r in recs:
            bw.write(r)
    out = str(tmp_path / "fast.cram")
    n = bam_to_cram_file(bam, out, nthreads=2)
    assert n == len(recs)
    h, sam = cram_file_to_sam(out)
    exp = b"".join(r.to_sam(hdr).encode() + b"\n" for r in recs)
    assert bytes(sam.tobytes()) == exp
    # and via the per-record writer: same decoded records
    out2 = str(tmp_path / "slow.cram")
    with CramWriter(out2, hdr) as cw:
        for r in recs:
            cw.write(r)
    h2, sam2 = cram_file_to_sam(out2)
    assert bytes(sam2.tobytes()) == exp


def test_bam_to_cram_file_multichrom(tmp_path):
    """Multi-chromosome input exercises RawRun slicing across tid
    boundaries and the vectorised endpos extraction."""
    from htslib_tpu.cram.batch import bam_to_cram_file
    from htslib_tpu.sam import BamWriter
    sam_text = "\n".join([
        "@HD\tVN:1.6\tSO:coordinate",
        "@SQ\tSN:c1\tLN:10000", "@SQ\tSN:c2\tLN:10000",
        "r1\t0\tc1\t100\t30\t4M2I4M\tc2\t500\t0\tACGTACGTAC\tIIIIIIIIII",
        "r2\t0\tc1\t200\t30\t5M100N5M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII",
        "r3\t4\t*\t0\t0\t*\t*\t0\t0\tGGGG\tJJJJ",
        "r4\t0\tc2\t50\t30\t10M\t*\t0\t0\tACGTACGTAC\t*",
    ]) + "\n"
    srcp = tmp_path / "mc.sam"
    srcp.write_text(sam_text)
    with SamReader(str(srcp)) as sr:
        recs = list(sr)
        hdr = sr.header
    bam = str(tmp_path / "mc.bam")
    with BamWriter(bam, hdr) as bw:
        for r in recs:
            bw.write(r)
    out = str(tmp_path / "mc.cram")
    assert bam_to_cram_file(bam, out) == len(recs)
    h, sam = cram_file_to_sam(out)
    # CRAM stores mate fields only for FPAIRED records, so compare
    # against the per-record writer's decode, not the original SAM
    out2 = str(tmp_path / "mc2.cram")
    with CramWriter(out2, hdr) as cw:
        for r in recs:
            cw.write(r)
    h2, sam2 = cram_file_to_sam(out2)
    assert bytes(sam.tobytes()) == bytes(sam2.tobytes())
