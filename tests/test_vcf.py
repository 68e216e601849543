"""VCF/BCF tests — modeled on reference test/test-vcf-api.c and test.pl's
VCF suite (test_bcf2vcf, test_vcf_various golden comparisons)."""
import glob
import os

import numpy as np
import pytest

from htslib_tpu.vcf import (BcfHeader, BcfReader, BcfRecord, BcfWriter,
                            VcfReader, VcfWriter, open_vcf)
from tests.conftest import REF_TEST, ref_path, has_ref

TABIX_DIR = "/root/reference/test/tabix"


def roundtrip_vcf_text(path, tmp_path):
    with VcfReader(path) as r:
        hdr = r.header
        recs = list(r)
    out = hdr.text()
    out += "".join(rec.to_vcf(hdr) + "\n" for rec in recs)
    return open(path).read(), out


@pytest.mark.parametrize("fname", ["index.vcf", "formatcols.vcf",
                                   "vcf_meta_meta.vcf"])
def test_vcf_text_roundtrip(fname, tmp_path):
    if not has_ref(fname):
        pytest.skip("missing")
    orig, regen = roundtrip_vcf_text(ref_path(fname), tmp_path)
    assert regen == orig


@pytest.mark.skipif(not has_ref("test-vcf-hdr-in.vcf"), reason="no corpus")
def test_vcf_header_golden():
    # test.pl:1186: htsfile -ch test-vcf-hdr-in.vcf == test-vcf-hdr.out
    with VcfReader(ref_path("test-vcf-hdr-in.vcf")) as r:
        got = r.header.text()
    want = open(ref_path("test-vcf-hdr.out")).read()
    assert got == want


@pytest.mark.skipif(not has_ref("formatmissing.vcf"), reason="no corpus")
def test_formatmissing_golden(tmp_path):
    # test.pl test_vcf_various: view of formatmissing.vcf == formatmissing-out.vcf
    with VcfReader(ref_path("formatmissing.vcf")) as r:
        hdr = r.header
        out = hdr.text() + "".join(rec.to_vcf(hdr) + "\n" for rec in r)
    want = open(ref_path("formatmissing-out.vcf")).read()
    assert out == want


@pytest.mark.skipif(not has_ref("noroundtrip.vcf"), reason="no corpus")
def test_noroundtrip_golden(tmp_path):
    with VcfReader(ref_path("noroundtrip.vcf")) as r:
        hdr = r.header
        out = hdr.text() + "".join(rec.to_vcf(hdr) + "\n" for rec in r)
    want = open(ref_path("noroundtrip-out.vcf")).read()
    assert out == want


@pytest.mark.skipif(not os.path.exists(os.path.join(TABIX_DIR, "vcf_file.bcf")),
                    reason="no corpus")
def test_bcf_to_vcf_golden():
    # vcf_file.bcf was produced from vcf_file.vcf; decoding it must give
    # back the text (modulo header IDX lines added by bcftools)
    with BcfReader(os.path.join(TABIX_DIR, "vcf_file.bcf")) as r:
        hdr = r.header
        body = "".join(rec.to_vcf(hdr) + "\n" for rec in r)
    want = open(os.path.join(TABIX_DIR, "vcf_file.vcf")).read()
    want_body = "".join(l for l in want.splitlines(keepends=True)
                        if not l.startswith("#"))
    assert body == want_body


def test_vcf_bcf_vcf_roundtrip(tmp_path):
    src = ref_path("index.vcf")
    if not has_ref("index.vcf"):
        pytest.skip("missing")
    with VcfReader(src) as r:
        hdr = r.header
        recs = list(r)
    bcf_path = str(tmp_path / "t.bcf")
    with BcfWriter(bcf_path, hdr) as w:
        for rec in recs:
            rec2 = BcfRecord.from_vcf(rec.to_vcf(hdr), hdr)
            w.write(rec2)
    with BcfReader(bcf_path) as r2:
        body = "".join(rec.to_vcf(r2.header) + "\n" for rec in r2)
    want = "".join(rec.to_vcf(hdr) + "\n" for rec in recs)
    assert body == want


def test_bcf_blob_passthrough(tmp_path):
    # BCF -> BCF must be byte-identical record payloads (blob reuse)
    src = os.path.join(TABIX_DIR, "vcf_file.bcf")
    if not os.path.exists(src):
        pytest.skip("missing")
    with BcfReader(src) as r:
        hdr = r.header
        recs = list(r)
    out = str(tmp_path / "o.bcf")
    with BcfWriter(out, hdr) as w:
        for rec in recs:
            w.write(rec)
    with BcfReader(out) as r2:
        recs2 = list(r2)
    assert len(recs) == len(recs2)
    for a, b in zip(recs, recs2):
        assert a.to_bcf() == b.to_bcf()


def test_header_api():
    h = BcfHeader("##fileformat=VCFv4.2\n"
                  '##FILTER=<ID=q10,Description="low qual">\n'
                  "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"depth\">\n"
                  "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"gt\">\n"
                  "##contig=<ID=chr1,length=100>\n"
                  "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB\n")
    assert h.n_samples == 2 and h.samples == ["A", "B"]
    assert h.id2int("PASS") == 0
    assert h.id2int("q10") == 1
    assert h.name2rid("chr1") == 0
    assert h.ctg_lens[0] == 100
    from htslib_tpu.vcf.header import BCF_HL_INFO, BCF_HT_INT
    t, vl, num = h.coltype(BCF_HL_INFO, h.id2int("DP"))
    assert t == BCF_HT_INT and num == 1
    # text round trip
    assert h.text().startswith("##fileformat=VCFv4.2\n")
    assert h.text().endswith("FORMAT\tA\tB\n")


def test_record_values():
    h = BcfHeader("##fileformat=VCFv4.2\n"
                  "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"d\">\n"
                  "##INFO=<ID=AF,Number=A,Type=Float,Description=\"d\">\n"
                  "##INFO=<ID=FL,Number=0,Type=Flag,Description=\"d\">\n"
                  "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"d\">\n"
                  "##FORMAT=<ID=AD,Number=R,Type=Integer,Description=\"d\">\n"
                  "##contig=<ID=c1>\n"
                  "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n")
    line = ("c1\t100\trs1\tAC\tA,ACT\t29.5\tPASS\tDP=14;AF=0.5,.;FL\t"
            "GT:AD\t0/1:10,4,.\t2|1:.")
    v = BcfRecord.from_vcf(line, h)
    assert v.pos == 99 and v.rlen == 2
    assert v.alleles == ["AC", "A", "ACT"]
    assert v.qual == pytest.approx(29.5)
    assert v.filters == [0]
    assert v.to_vcf(h) == line
    # BCF round trip preserves text
    shared, indiv = v.to_bcf()
    v2 = BcfRecord.from_bcf(shared, indiv, h)
    assert v2.to_vcf(h) == line


def test_gt_edge_cases():
    h = BcfHeader("##fileformat=VCFv4.2\n"
                  "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"d\">\n"
                  "##contig=<ID=c>\n"
                  "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB\tC\n")
    line = "c\t5\t.\tA\tT\t.\t.\t.\tGT\t./.\t1\t0|1"
    v = BcfRecord.from_vcf(line, h)
    assert v.to_vcf(h) == line


# ---------------------------------------------------------------------------
# VCFv4.4/4.5 local alleles + header sanity (vcf.c:947-951, 1290-1430)

LA_HDR = """##fileformat=VCFv4.5
##contig=<ID=c1,length=1000>
##FORMAT=<ID=GT,Number=1,Type=String,Description="g">
##FORMAT=<ID=LAA,Number=.,Type=Integer,Description="local alt indices">
##FORMAT=<ID=LAD,Number=LR,Type=Integer,Description="local depths">
##FORMAT=<ID=LPL,Number=LG,Type=Integer,Description="local PL">
##FORMAT=<ID=PSL,Number=P,Type=String,Description="phase set list">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
"""


def test_local_allele_number_codes():
    from htslib_tpu.vcf.header import (BCF_HL_FMT, BCF_VL_LA, BCF_VL_LG,
                                       BCF_VL_LR, BCF_VL_P)
    hdr = BcfHeader(LA_HDR)
    assert hdr.id_info[hdr.id2int("LAD")].vl[BCF_HL_FMT] == BCF_VL_LR
    assert hdr.id_info[hdr.id2int("LPL")].vl[BCF_HL_FMT] == BCF_VL_LG
    assert hdr.id_info[hdr.id2int("PSL")].vl[BCF_HL_FMT] == BCF_VL_P
    # LA/LR/LG are FORMAT-only: on INFO they fall back to Number=.
    h2 = BcfHeader('##fileformat=VCFv4.5\n'
                   '##INFO=<ID=X,Number=LR,Type=Integer,Description="x">\n'
                   '#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n')
    from htslib_tpu.vcf.header import BCF_HL_INFO, BCF_VL_LR as LR
    assert h2.id_info[h2.id2int("X")].vl[BCF_HL_INFO] != LR


def test_local_allele_roundtrip():
    hdr = BcfHeader(LA_HDR)
    line = ("c1\t10\t.\tA\tT,G,C\t50\t.\t.\tGT:LAA:LAD:LPL\t"
            "0/2:2:30,14:40,0,50")
    rec = BcfRecord.from_vcf(line, hdr)
    assert rec.to_vcf(hdr) == line
    sh, ind = rec.to_bcf()
    assert BcfRecord.from_bcf(sh, ind, hdr).to_vcf(hdr) == line


def test_header_check_sanity():
    bad = BcfHeader('##fileformat=VCFv4.5\n'
                    '##INFO=<ID=AC,Number=1,Type=Float,Description="x">\n'
                    '##FORMAT=<ID=LAD,Number=.,Type=Integer,Description="x">\n'
                    '##FORMAT=<ID=PL,Number=G,Type=Float,Description="x">\n'
                    '#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n')
    w = bad.check_sanity()
    assert any("AC should be declared as Number=A" in x for x in w)
    assert any("PL (FORMAT) should be declared as Type=Integer" in x
               for x in w)
    assert not any(x.startswith("LAD") for x in w)  # Number=. tolerated


def test_bcf_csi_index_and_fetch(tmp_path):
    # bcf_index_build + indexed region queries (vcf.c bcf_index_build,
    # bcf_itr_queryi via the shared hts_itr machinery)
    from htslib_tpu.vcf import BcfReader, BcfWriter, VcfReader
    from htslib_tpu.vcf.io import bcf_index_build
    from tests.conftest import has_ref, ref_path
    if not has_ref("index.vcf"):
        import pytest
        pytest.skip("no corpus")
    with VcfReader(ref_path("index.vcf")) as r:
        hdr, recs = r.header, list(r)
    p = str(tmp_path / "t.bcf")
    w = BcfWriter(p, hdr)
    for rec in recs:
        w.write(rec)
    w.close()
    bcf_index_build(p)
    import os
    assert os.path.exists(p + ".csi")
    with BcfReader(p) as r2:
        for name, beg, end in [("1", 10000000, 10001000), ("1", 0, 1 << 31),
                               ("2", 3199000, 3200000), ("3", 0, 10 ** 9)]:
            rid = r2.header.name2rid(name)
            got = [(rec.rid, rec.pos) for rec in r2.fetch(rid, beg, end)]
            want = [(rec.rid, rec.pos) for rec in recs
                    if rec.rid == rid and rec.pos < end
                    and rec.pos + max(rec.rlen, 1) > beg]
            assert got == want, (name, beg, end)


def test_bcf_on_the_fly_index_matches_posthoc(tmp_path):
    # --write-index path: the index built while writing must be
    # byte-identical to one built by re-reading the finished file
    from htslib_tpu.vcf import BcfReader, BcfWriter, VcfReader
    from htslib_tpu.vcf.io import bcf_index_build
    from tests.conftest import has_ref, ref_path
    import os
    if not has_ref("index.vcf"):
        import pytest
        pytest.skip("no corpus")
    with VcfReader(ref_path("index.vcf")) as r:
        hdr, recs = r.header, list(r)
    p = str(tmp_path / "t.bcf")
    w = BcfWriter(p, hdr, build_index=True)
    for rec in recs:
        w.write(rec)
    w.close()
    otf = open(p + ".csi", "rb").read()
    bcf_index_build(p)
    assert open(p + ".csi", "rb").read() == otf


def test_bcf_file_to_vcf_fast_path(tmp_path):
    """Native whole-file BCF->VCF (htstpu_bcf_to_vcf) must equal the
    per-record Python to_vcf output on the reference corpus."""
    from htslib_tpu.vcf import BcfWriter, VcfReader
    from htslib_tpu.vcf.io import bcf_file_to_vcf
    src = "/root/reference/test/index.vcf"
    with VcfReader(src) as r:
        hdr = r.header.copy()
        recs = list(r)
    p = str(tmp_path / "c.bcf")
    with BcfWriter(p, hdr) as w:
        for rec in recs:
            w.write(rec)
    hdr2, got = bcf_file_to_vcf(p)
    want = "".join(rec.to_vcf(hdr) + "\n" for rec in recs).encode()
    assert got == want


def test_bcf_file_to_vcf_vs_htslib(tmp_path):
    import os
    import subprocess
    htsfile = os.path.join(os.environ.get("HTSLIB_BUILD",
                                          "/tmp/htslib-build"), "htsfile")
    if not os.path.exists(htsfile):
        import pytest
        pytest.skip("reference htslib not built")
    from htslib_tpu.vcf import BcfWriter, VcfReader
    from htslib_tpu.vcf.io import bcf_file_to_vcf
    with VcfReader("/root/reference/test/index.vcf") as r:
        hdr = r.header.copy()
        recs = list(r)
    p = str(tmp_path / "c.bcf")
    with BcfWriter(p, hdr) as w:
        for rec in recs:
            w.write(rec)
    hdr2, got = bcf_file_to_vcf(p)
    out = subprocess.run([htsfile, "-c", p], capture_output=True,
                         check=True).stdout
    want = b"".join(l + b"\n" for l in out.splitlines()
                    if not l.startswith(b"#"))
    assert got == want


def test_native_vcf_parse_byte_identity(tmp_path):
    """The native VCF parser (htstpu_vcf_parse) must produce frames
    byte-identical to the Python from_vcf+to_bcf path, including the
    bail-splice for lines that need header mutation."""
    import struct

    from htslib_tpu.vcf import VcfReader
    from htslib_tpu.vcf.io import vcf_body_to_bcf_frames
    src = "/root/reference/test/index.vcf"
    with VcfReader(src) as r:
        hdr = r.header.copy()
        recs = list(r)
    raw = open(src, "rb").read()
    body = b"".join(l for l in raw.splitlines(keepends=True)
                    if not l.startswith(b"#"))
    frames = vcf_body_to_bcf_frames(body, hdr)
    want = bytearray()
    for rec in recs:
        s, i = rec.to_bcf()
        want += struct.pack("<II", len(s), len(i)) + s + i
    assert frames == bytes(want)


def test_native_vcf_parse_bail_splice(tmp_path):
    """Lines with unknown contigs bail to Python (which interns the
    contig) and splice back in order."""
    import struct

    from htslib_tpu.vcf import BcfHeader, BcfRecord
    from htslib_tpu.vcf.io import vcf_body_to_bcf_frames
    hdr_text = ("##fileformat=VCFv4.2\n##contig=<ID=1>\n"
                '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">\n'
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    body = (b"1\t100\t.\tA\tT\t.\t.\tDP=5\n"
            b"chrNEW\t7\t.\tC\tG\t.\t.\t.\n"     # unknown contig -> bail
            b"1\t200\t.\tG\tC\t.\t.\tDP=9\n")
    hdr = BcfHeader(hdr_text)
    frames = vcf_body_to_bcf_frames(body, hdr)
    hdr2 = BcfHeader(hdr_text)
    want = bytearray()
    for line in body.decode().splitlines():
        rec = BcfRecord.from_vcf(line, hdr2)
        s, i = rec.to_bcf()
        want += struct.pack("<II", len(s), len(i)) + s + i
    assert frames == bytes(want)
    assert "chrNEW" in hdr.ctg_names      # python path interned it


def test_vcf_file_to_bcf_vs_htslib(tmp_path):
    import os
    import subprocess

    from htslib_tpu.vcf.io import vcf_file_to_bcf
    htsfile = os.path.join(os.environ.get("HTSLIB_BUILD",
                                          "/tmp/htslib-build"), "htsfile")
    if not os.path.exists(htsfile):
        import pytest
        pytest.skip("reference htslib not built")
    out = str(tmp_path / "f.bcf")
    n = vcf_file_to_bcf("/root/reference/test/index.vcf", out)
    got = subprocess.run([htsfile, "-c", out], capture_output=True,
                         check=True).stdout
    body = [l for l in got.splitlines() if not l.startswith(b"#")]
    assert len(body) == n == 621


def test_vcf44_phasing_golden(tmp_path):
    """VCF 4.4 GT phasing: parse inference (vcf.c:3434) + minimal
    prefix output (bcf_format_gt_v2, vcf.c:6382), against the
    reference's vcf44_1.vcf -> vcf44_1.expected golden pair, through
    both the python record path and the native VCF->BCF->VCF path."""
    from htslib_tpu.vcf import VcfReader
    from htslib_tpu.vcf.io import bcf_file_to_vcf, vcf_file_to_bcf

    src = ref_path("vcf44_1.vcf")
    exp = open(ref_path("vcf44_1.expected")).read()
    exp_body = "".join(l + "\n" for l in exp.splitlines()
                       if not l.startswith("#"))

    with VcfReader(src) as r:
        hdr = r.header
        assert hdr.v44
        got = "".join(rec.to_vcf(hdr) + "\n" for rec in r)
    assert got == exp_body

    bcf = str(tmp_path / "v44.bcf")
    n = vcf_file_to_bcf(src, bcf)
    assert n == 28
    _, text = bcf_file_to_vcf(bcf)
    text = text.decode() if isinstance(text, (bytes, bytearray)) else text
    got2 = "".join(l + "\n" for l in text.splitlines()
                   if not l.startswith("#"))
    assert got2 == exp_body


def test_pre44_updatephasing_on_bcf_read(tmp_path):
    """Pre-4.4 BCF read derives the first allele's phase
    (updatephasing via bcf_record_check, vcf.c:1985/2058) so binary GT
    values are consistent across versions: haploid known -> phased,
    diploid first copies the AND of later phase bits, vector ends
    count as phased."""
    from htslib_tpu.vcf import BcfReader, BcfWriter

    hdr = BcfHeader("##fileformat=VCFv4.2\n"
                    "##contig=<ID=1,length=1000>\n"
                    '##FORMAT=<ID=GT,Number=1,Type=String,'
                    'Description="G">\n'
                    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                    "\tFORMAT\tS1\tS2\n")
    body = ["1\t10\t.\tA\tT\t.\t.\t.\tGT\t0|1\t0/1",
            "1\t11\t.\tA\tT\t.\t.\t.\tGT\t0\t.",
            "1\t12\t.\tA\tT\t.\t.\t.\tGT\t1\t0|1"]
    path = str(tmp_path / "p.bcf")
    with BcfWriter(path, hdr) as w:
        for line in body:
            w.write(BcfRecord.from_vcf(line, hdr))
    with BcfReader(path) as r:
        recs = list(r)
    g0 = recs[0].fmt[0].value
    assert g0[0, 0] & 1 == 1          # 0|1: first phased (second is)
    assert g0[1, 0] & 1 == 0          # 0/1: second unphased
    g1 = recs[1].fmt[0].value
    assert g1[0, 0] & 1 == 1          # haploid known: implicitly phased
    assert g1[1, 0] == 0              # lone '.': missing, unphased
    # text output is unchanged by the binary normalisation (pre-4.4
    # format ignores the first phase bit)
    assert recs[0].to_vcf(hdr).split("\t")[9:] == ["0|1", "0/1"]


def test_bcf_translate_golden():
    """bcf_hdr_merge + bcf_translate against the reference's
    test-bcf-translate.c driver and its .out golden: merged header
    byte-exact (incl. the bcf_hdr_init seed lines and dst-first line
    order) and the translated record's ids remapped with removed
    FILTER/INFO/FORMAT entries dropped."""
    from htslib_tpu.vcf.merge import bcf_hdr_merge, bcf_translate

    h1_lines = [
        "##contig=<ID=1>", "##contig=<ID=2>",
        '##FILTER=<ID=FLT1,Description="Filter 1">',
        '##FILTER=<ID=FLT2,Description="Filter 2">',
        '##FILTER=<ID=FLT3,Description="Filter 3">',
        '##INFO=<ID=INF1,Number=.,Type=Integer,Description="Info 1">',
        '##INFO=<ID=INF2,Number=.,Type=Integer,Description="Info 2">',
        '##INFO=<ID=INF3,Number=.,Type=Integer,Description="Info 3">',
        '##FORMAT=<ID=FMT1,Number=.,Type=Integer,Description="FMT 1">',
        '##FORMAT=<ID=FMT2,Number=.,Type=Integer,Description="FMT 2">',
        '##FORMAT=<ID=FMT3,Number=.,Type=Integer,Description="FMT 3">',
    ]
    h2_lines = [
        "##contig=<ID=2>", "##contig=<ID=1>",
        '##FILTER=<ID=FLT4,Description="Filter 4">',
        '##FILTER=<ID=FLT3,Description="Filter 3">',
        '##FILTER=<ID=FLT2,Description="Filter 2">',
        '##INFO=<ID=INF4,Number=.,Type=Integer,Description="Info 4">',
        '##INFO=<ID=INF3,Number=.,Type=Integer,Description="Info 3">',
        '##INFO=<ID=INF2,Number=.,Type=Integer,Description="Info 2">',
        '##FORMAT=<ID=FMT4,Number=.,Type=Integer,Description="FMT 4">',
        '##FORMAT=<ID=FMT3,Number=.,Type=Integer,Description="FMT 3">',
        '##FORMAT=<ID=FMT2,Number=.,Type=Integer,Description="FMT 2">',
    ]
    h1, h2 = BcfHeader(), BcfHeader()
    for line in h1_lines:
        h1.append_line(line)
    for line in h2_lines:
        h2.append_line(line)
    h1.samples = ["SMPL1", "SMPL2"]
    h2.samples = ["SMPL1", "SMPL2"]
    h2 = bcf_hdr_merge(h2, h1)

    rec = BcfRecord()
    rec.rid = h1.ctg_names.index("1")
    rec.pos = 0
    rec.n_sample = 2
    rec.qual = 0.0
    rec.update_alleles_str(h1, "G,A")
    rec.update_filter(h1, [h1.id2int("FLT1"), h1.id2int("FLT2"),
                           h1.id2int("FLT3")])
    rec.update_info(h1, "INF1", [1])
    rec.update_info(h1, "INF2", [2])
    rec.update_info(h1, "INF3", [3])
    rec.update_format(h1, "FMT1", np.array([[1], [1]], np.int32))
    rec.update_format(h1, "FMT2", np.array([[2], [2]], np.int32))
    rec.update_format(h1, "FMT3", np.array([[3], [3]], np.int32))
    rec.remove_filter(h1, h1.id2int("FLT2"))
    rec.update_info(h1, "INF2", None)
    rec.update_format(h1, "FMT2", None)
    bcf_translate(h2, h1, rec)

    exp = open(ref_path("test-bcf-translate.out")).read().splitlines()
    got = h2.text().splitlines() + [rec.to_vcf(h2)]
    assert got == exp


@pytest.mark.skipif(not os.path.exists(
    os.path.join(os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build"),
                 "test", "test_view")), reason="reference htslib not built")
def test_vcf44_gt_differential_fuzz(tmp_path):
    """Differential fuzz of VCF 4.4 GT phasing against the reference:
    random ploidy 1-3 calls with random explicit prefixes and missing
    alleles, compared through (a) reference vcf->vcf, (b) the
    reference reading OUR BCF, and (c) our own BCF->VCF."""
    import random
    import subprocess

    from htslib_tpu.vcf.io import bcf_file_to_vcf, vcf_file_to_bcf

    tv = os.path.join(os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build"),
                      "test", "test_view")
    rnd = random.Random(4242)
    hdr_text = ("##fileformat=VCFv4.4\n##contig=<ID=1,length=100000>\n"
                '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                "\tS1\tS2\tS3\n")

    def rand_gt():
        ploidy = rnd.choice([1, 1, 2, 2, 3])
        parts = []
        for i in range(ploidy):
            a = rnd.choice([".", "0", "1", "2"])
            parts.append((rnd.choice(["", "", "|", "/"]) if i == 0
                          else rnd.choice("|/")) + a)
        return "".join(parts)

    for trial in range(6):
        lines = ["1\t%d\t.\tA\tT,G\t30\tPASS\t.\tGT\t%s" %
                 (100 + i, "\t".join(rand_gt() for _ in range(3)))
                 for i in range(25)]
        vcf = str(tmp_path / "fz.vcf")
        open(vcf, "w").write(hdr_text + "".join(l + "\n" for l in lines))
        r = subprocess.run([tv, vcf], capture_output=True, timeout=60)
        assert r.returncode == 0, r.stderr[:200]
        want = [l for l in r.stdout.decode().splitlines()
                if not l.startswith("#")]
        bcf = str(tmp_path / "fz.bcf")
        vcf_file_to_bcf(vcf, bcf)
        r2 = subprocess.run([tv, bcf], capture_output=True, timeout=60)
        assert r2.returncode == 0, r2.stderr[:200]
        got_hts = [l for l in r2.stdout.decode().splitlines()
                   if not l.startswith("#")]
        assert got_hts == want, trial
        _, text = bcf_file_to_vcf(bcf)
        text = (text.decode() if isinstance(text, (bytes, bytearray))
                else text)
        got = [l for l in text.splitlines() if not l.startswith("#")]
        assert got == want, trial


@pytest.mark.skipif(not os.path.exists(
    os.path.join(os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build"),
                 "test", "test_view")), reason="reference htslib not built")
def test_vcf_differential_fuzz(tmp_path):
    """Random VCF records (INFO/FORMAT zoo incl. missing '.' strings,
    symbolic alleles, negative and vector ints, missing floats)
    compared three ways per trial: reference vcf->vcf text, the
    reference reading OUR BCF, and our own BCF->VCF — all three must
    print identically.  Caught the FORMAT-string missing-value wire
    divergence (literal '.' vs bcf_str_missing 0x07)."""
    import random
    import subprocess

    from htslib_tpu.vcf.io import bcf_file_to_vcf, vcf_file_to_bcf

    tv = os.path.join(os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build"),
                      "test", "test_view")
    rnd = random.Random(31337)
    hdr = ("##fileformat=VCFv4.2\n"
           "##contig=<ID=1,length=100000>\n##contig=<ID=2,length=50000>\n"
           '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">\n'
           '##INFO=<ID=AF,Number=A,Type=Float,Description="f">\n'
           '##INFO=<ID=AA,Number=1,Type=String,Description="s">\n'
           '##INFO=<ID=DB,Number=0,Type=Flag,Description="g">\n'
           '##INFO=<ID=NL,Number=.,Type=Integer,Description="l">\n'
           '##FILTER=<ID=q10,Description="q">\n'
           '##FILTER=<ID=s50,Description="s">\n'
           '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
           '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">\n'
           '##FORMAT=<ID=HQ,Number=2,Type=Integer,Description="h">\n'
           '##FORMAT=<ID=TS,Number=1,Type=String,Description="t">\n'
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
           "\tS1\tS2\n")

    def rand_rec(i):
        alt = rnd.choice(["T", "G,C", "<DEL>", "*", "TA"])
        infos = []
        if rnd.random() < .7:
            infos.append("DP=%d" % rnd.randint(-100, 10000))
        if rnd.random() < .5:
            na = alt.count(",") + 1
            infos.append("AF=" + ",".join(
                rnd.choice(["0.5", ".", "1e-3", "-0.25"])
                for _ in range(na)))
        if rnd.random() < .4:
            infos.append("AA=" + rnd.choice(["T", "xyz", "?"]))
        if rnd.random() < .3:
            infos.append("DB")
        if rnd.random() < .3:
            infos.append("NL=" + ",".join(
                str(rnd.randint(-1000, 1000))
                for _ in range(rnd.randint(1, 4))))
        fmts = ["GT"]
        s1 = [rnd.choice(["0/1", "1|0", ".", "0", "1/2"])]
        s2 = [rnd.choice(["0/0", "./.", "1"])]
        if rnd.random() < .6:
            fmts.append("DP")
            s1.append(str(rnd.randint(0, 99)))
            s2.append(rnd.choice([".", "7"]))
        if rnd.random() < .4:
            fmts.append("HQ")
            s1.append("%d,%d" % (rnd.randint(0, 60), rnd.randint(0, 60)))
            s2.append(rnd.choice([".,.", "3,4", "."]))
        if rnd.random() < .3:
            fmts.append("TS")
            s1.append(rnd.choice(["abc", "?", "x~y"]))
            s2.append(rnd.choice(["zz", "."]))
        return "\t".join(["1", str(rnd.randint(1, 90000)),
                          rnd.choice([".", f"rs{i}"]),
                          rnd.choice(["A", "C", "GT", "ACGT"]), alt,
                          rnd.choice([".", "0", "29", "3.14"]),
                          rnd.choice([".", "PASS", "q10", "q10;s50"]),
                          ";".join(infos) if infos else ".",
                          ":".join(fmts), ":".join(s1), ":".join(s2)])

    for trial in range(5):
        vcf = str(tmp_path / "f.vcf")
        open(vcf, "w").write(hdr + "".join(
            rand_rec(i) + "\n" for i in range(150)))
        r1 = subprocess.run([tv, vcf], capture_output=True, timeout=60)
        if r1.returncode != 0:
            continue
        want = [l for l in r1.stdout.decode().splitlines()
                if not l.startswith("#")]
        bcf = str(tmp_path / "f.bcf")
        vcf_file_to_bcf(vcf, bcf)
        r2 = subprocess.run([tv, bcf], capture_output=True, timeout=60)
        assert r2.returncode == 0, r2.stderr[:300]
        assert [l for l in r2.stdout.decode().splitlines()
                if not l.startswith("#")] == want, trial
        _, text = bcf_file_to_vcf(bcf)
        text = (text.decode() if isinstance(text, (bytes, bytearray))
                else text)
        assert [l for l in text.splitlines()
                if not l.startswith("#")] == want, trial
