"""SAM/BAM record and round-trip tests — modeled on reference test/sam.c
and test.pl's test_view SAM<->BAM cross-conversions over the ce#/c1#/xx#
corpora."""
import glob
import os
import struct

import numpy as np
import pytest

from htslib_tpu.sam import (BamReader, BamRecord, BamWriter, SamHeader,
                            SamReader, SamWriter)
from htslib_tpu.sam.cigar import parse_cigar, format_cigar, cigar2qlen, cigar2rlen, reg2bin
from tests.conftest import REF_TEST, ref_path, has_ref

CORPUS = sorted(
    os.path.basename(p) for p in
    glob.glob(os.path.join(REF_TEST, "*.sam"))
    if os.path.basename(p).startswith(("ce#", "c1#", "c2#", "xx#", "md#"))
) if os.path.isdir(REF_TEST) else []


def roundtrip_sam(path, tmp_path):
    """SAM -> BAM -> SAM; return (original_text, regenerated_text)."""
    orig = open(path, "rb").read().decode()
    bam_path = str(tmp_path / "rt.bam")
    with SamReader(path) as r:
        header = r.header
        records = list(r)
    with BamWriter(bam_path, header) as w:
        for rec in records:
            w.write(rec)
    out_lines = []
    with BamReader(bam_path) as r2:
        out_lines.append(r2.header.text)
        for rec in r2:
            out_lines.append(rec.to_sam(r2.header) + "\n")
    return orig, "".join(out_lines)


@pytest.mark.parametrize("fname", CORPUS or ["skip"])
def test_corpus_sam_bam_roundtrip(fname, tmp_path):
    if fname == "skip":
        pytest.skip("no corpus")
    orig, regen = roundtrip_sam(ref_path(fname), tmp_path)
    assert regen == normalize_sam(orig), f"round-trip mismatch for {fname}"


def normalize_sam(text):
    """Canonicalize SEQ through the nt16 table (what htslib's own
    SAM->BAM->SAM does; test.pl uses compare_sam.pl for the same reason)."""
    from htslib_tpu.sam.record import _NT16_TABLE, SEQ_NT16_STR
    out = []
    for line in text.split("\n"):
        if not line or line.startswith("@"):
            out.append(line)
            continue
        cols = line.split("\t")
        if len(cols) >= 10 and cols[9] != "*":
            cols[9] = "".join(SEQ_NT16_STR[_NT16_TABLE[ord(c)]] for c in cols[9])
        out.append("\t".join(cols))
    return "\n".join(out)


def test_cigar_helpers():
    c = parse_cigar("10M2I3D5S")
    assert format_cigar(c) == "10M2I3D5S"
    assert cigar2qlen(c) == 17
    assert cigar2rlen(c) == 13
    assert format_cigar(parse_cigar("*")) == "*"
    assert reg2bin(0, 1) == 4681
    assert reg2bin(-1, 0) == 4680


def test_record_basics():
    hdr = SamHeader("@SQ\tSN:chr1\tLN:1000\n")
    line = "r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tFFFF\tNM:i:0\tXX:Z:hi"
    rec = BamRecord.from_sam(line, hdr)
    assert rec.qname == b"r1"
    assert rec.tid == 0 and rec.pos == 99
    assert rec.seq == "ACGT"
    assert rec.qual_str == "FFFF"
    assert rec.get_aux("NM") == 0
    assert rec.get_aux("XX") == "hi"
    assert rec.to_sam(hdr) == line
    # BAM round trip
    buf = rec.to_bam_buffer()
    rec2 = BamRecord.from_bam_buffer(buf)
    assert rec2.to_sam(hdr) == line
    assert rec == rec2


def test_aux_crud():
    hdr = SamHeader("@SQ\tSN:c\tLN:10\n")
    rec = BamRecord.from_sam("q\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*", hdr)
    rec.set_aux("NM", "i", 5)
    rec.set_aux("FL", "f", 1.5)
    rec.set_aux("AR", "B", ("i", [1, -2, 3]))
    assert rec.get_aux("NM") == 5
    assert rec.get_aux("FL") == 1.5
    assert list(rec.get_aux("AR")) == [1, -2, 3]
    rec.set_aux("NM", "i", 7)
    assert rec.get_aux("NM") == 7
    assert rec.del_aux("FL")
    assert rec.get_aux("FL") is None
    names = [t for t, _, _ in rec.aux_items()]
    assert names == [b"NM", b"AR"]


def test_aux_int_width_selection():
    hdr = SamHeader()
    r = BamRecord.from_sam("q\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\tXA:i:5\tXB:i:-5\t"
                           "XC:i:300\tXD:i:-300\tXE:i:70000\tXF:i:-70000", hdr)
    types = {t.decode(): chr(r.aux[r._aux_find(t)[1] - 1]) for t in
             [b"XA", b"XB", b"XC", b"XD", b"XE", b"XF"]}
    assert types == {"XA": "C", "XB": "c", "XC": "S", "XD": "s",
                     "XE": "I", "XF": "i"}


def test_long_cigar_cg_tag():
    n_ops = 70000
    hdr = SamHeader("@SQ\tSN:chr1\tLN:10000000\n")
    cig = "".join("1M1I" for _ in range(n_ops // 2))
    seq = "A" * n_ops
    rec = BamRecord.from_sam(f"q\t0\tchr1\t1\t60\t{cig}\t*\t0\t0\t{seq}\t*", hdr)
    assert len(rec.cigar) == n_ops
    buf = rec.to_bam_buffer()
    # on disk: fake 2-op cigar + CG tag
    n_cigar = struct.unpack_from("<H", buf, 12)[0]
    assert n_cigar == 2
    rec2 = BamRecord.from_bam_buffer(buf)
    assert len(rec2.cigar) == n_ops
    assert rec2.get_aux("CG") is None
    assert format_cigar(rec2.cigar) == cig


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_range_bam_reads():
    with BamReader(ref_path("range.bam")) as r:
        assert r.header.nref > 0
        n = 0
        for rec in r:
            n += 1
            assert rec.tid < r.header.nref
        assert n > 0


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_range_bam_bulk_scan_matches_streaming():
    with BamReader(ref_path("range.bam")) as r:
        recs = [rec.to_bam_buffer() for rec in r]
    with BamReader(ref_path("range.bam")) as r:
        data, offs, sizes = r.raw_records()
    assert len(offs) == len(recs)
    for i in (0, len(recs) // 2, len(recs) - 1):
        o, s = int(offs[i]), int(sizes[i])
        assert bytes(data[o + 4:o + s]) == recs[i]


def test_header_api():
    h = SamHeader("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100\n"
                  "@RG\tID:rg1\tSM:s1\n@CO\tfree text\n")
    assert h.version == "1.6"
    assert h.nref == 1
    assert h.name2tid("chr1") == 0
    assert h.tid2len(0) == 100
    assert h.count_lines("SQ") == 1
    assert h.find_tag_id("RG", "ID", "rg1", "SM") == "s1"
    h.update_line("RG", "ID", "rg1", "SM", "s2")
    assert h.find_tag_id("RG", "ID", "rg1", "SM") == "s2"
    h.add_line("PG", "ID", "prog1")
    h.add_pg("tool")
    pgs = [l for l in h.lines if l.type == "PG"]
    assert pgs[-1].get("PP") == "prog1"
    assert h.remove_line_id("RG", "ID", "rg1")
    assert h.count_lines("RG") == 0
    # text round trip unmodified header
    t = "@HD\tVN:1.6\n@SQ\tSN:c\tLN:5\n"
    assert SamHeader(t).text == t
